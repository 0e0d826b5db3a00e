"""Layered config source (S6): defaults -> default.yaml -> engines.yaml
-> explicit file -> dotted overrides, deep-merged; dotted getter; CLI
flags inherit config values as defaults (ocr_project_spark/config.py,
reference utils/config.py:63-185)."""

from __future__ import annotations

import pytest

from ocr_project_spark.config import Config, deep_merge, load_config
from ocr_project_spark.job import build_parser


def test_defaults_only():
    cfg = load_config()
    assert cfg.get("partitioning.n_buckets") == 64
    assert cfg.get("extract.normalize") is None
    assert cfg.get("classifiers.density.enabled") is True
    assert cfg.get("no.such.key", "fb") == "fb"


def test_deep_merge_is_pure_and_recursive():
    base = {"a": {"x": 1, "y": 2}, "b": 3}
    over = {"a": {"y": 20, "z": 30}, "c": 4}
    out = deep_merge(base, over)
    assert out == {"a": {"x": 1, "y": 20, "z": 30}, "b": 3, "c": 4}
    assert base == {"a": {"x": 1, "y": 2}, "b": 3}  # not mutated


def test_layer_precedence(tmp_path):
    (tmp_path / "default.yaml").write_text(
        "extract:\n  normalize: balanced\npartitioning:\n  n_buckets: 16\n"
    )
    (tmp_path / "engines.yaml").write_text(
        "classifiers:\n  density:\n    enabled: false\n"
        "extract:\n  normalize: enhanced\n"
    )
    custom = tmp_path / "custom.yaml"
    custom.write_text("partitioning:\n  n_buckets: 32\n")

    cfg = load_config(str(tmp_path), str(custom),
                      overrides=["extract.mega_span_threshold=99",
                                 "extract.chunk_mega_docs=true"])
    assert cfg.get("extract.normalize") == "enhanced"      # engines > default
    assert cfg.get("partitioning.n_buckets") == 32         # custom > layers
    assert cfg.get("classifiers.density.enabled") is False
    assert cfg.get("extract.mega_span_threshold") == 99    # typed override
    assert cfg.get("extract.chunk_mega_docs") is True
    assert cfg.get("partitioning.bucket_batch_size") == 8  # untouched default


def test_json_file_and_spark_subtree(tmp_path):
    f = tmp_path / "conf.json"
    f.write_text('{"spark": {"spark.sql.shuffle.partitions": 12}}')
    cfg = load_config(config_file=str(f))
    assert cfg.spark_conf() == {"spark.sql.shuffle.partitions": "12"}


def test_bad_override_rejected():
    with pytest.raises(ValueError, match="key.path=value"):
        load_config(overrides=["nonsense"])


def test_cli_defaults_come_from_config(tmp_path):
    (tmp_path / "default.yaml").write_text(
        "extract:\n  normalize: auto\n  mega_span_threshold: 123\n"
        "partitioning:\n  n_buckets: 7\n"
    )
    cfg = load_config(str(tmp_path))
    args = build_parser(cfg).parse_args(
        ["--output", "/tmp/x", "--run-id", "r", "--input", "/tmp/in"]
    )
    assert args.normalize == "auto"
    assert args.buckets == 7
    assert args.mega_span_threshold == 123
    # explicit flag still wins over config
    args2 = build_parser(cfg).parse_args(
        ["--output", "/tmp/x", "--run-id", "r", "--input", "/tmp/in",
         "--normalize", "minimal", "--buckets", "9"]
    )
    assert args2.normalize == "minimal"
    assert args2.buckets == 9


def test_config_object_dotted_getter():
    c = Config({"a": {"b": {"c": 5}}, "d": [1, 2]})
    assert c.get("a.b.c") == 5
    assert c.get("a.b") == {"c": 5}
    assert c.get("d.0") is None  # lists are terminal
    assert c.as_dict()["d"] == [1, 2]


def test_error_taxonomy():
    """Driver-side failures raise the taxonomy (reference
    exceptions.py hierarchy); per-document failures are status rows
    whose reasons the REASON_INFO registry describes."""
    from ocr_project_spark import errors
    from ocr_project_spark.functions.engine_udfs import get_classifier

    with pytest.raises(errors.ConfigurationError):
        load_config(overrides=["bad"])
    with pytest.raises(errors.ClassifierNotAvailableError):
        get_classifier("no_such_classifier")
    # taxonomy roots + builtin conventions both hold
    assert issubclass(errors.ConfigurationError, errors.ExtractionError)
    assert issubclass(errors.ConfigurationError, ValueError)
    assert issubclass(errors.ClassifierNotAvailableError, KeyError)
    # every status reason the pipeline can emit is registered
    from ocr_project_spark.operators.extract import doc_status_expr  # noqa: F401
    assert set(errors.REASON_INFO) == {
        errors.REASON_NULL_DOC_ID,
        errors.REASON_NULL_SPANS,
        errors.REASON_MALFORMED_SPAN,
    }
