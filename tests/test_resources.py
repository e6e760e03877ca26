"""Resource parsing + annotation sanitizer tests (capacity-manager analog,
mirroring the construction-validation cases of the reference's
capacitymanager tests and the bad_strings label fuzz)."""

from __future__ import annotations

import pytest

from bacalhau_spark.resources import (parse_cpu, parse_memory,
                                      sanitize_annotation, to_spark_conf)
from tests.test_operators import NAUGHTY


@pytest.mark.parametrize("raw,want", [
    ("500m", 0.5), ("2", 2.0), ("0.1", 0.1), ("100u", 1e-4),
    (3, 3.0), ("", 0.0),
])
def test_parse_cpu(raw, want):
    assert parse_cpu(raw) == pytest.approx(want)


@pytest.mark.parametrize("raw,want", [
    ("2Gb", 2 << 30), ("512mb", 512 << 20), ("1024", 1024),
    ("1.5k", 1536), (42, 42), ("", 0),
])
def test_parse_memory(raw, want):
    assert parse_memory(raw) == want


def test_parse_errors():
    with pytest.raises(ValueError):
        parse_cpu("abc")
    with pytest.raises(ValueError):
        parse_memory("2 parsecs")


def test_sanitize_annotation_naughty_corpus():
    for s in NAUGHTY:
        out = sanitize_annotation(s)
        assert all(c.isalnum() or c in "_:|-" for c in out), repr(out)
    assert sanitize_annotation("ok_label:v1|x-y") == "ok_label:v1|x-y"
    assert sanitize_annotation("with space 👾") == "withspace"


def test_to_spark_conf():
    conf = to_spark_conf({"cpu": "1500m", "memory": "2Gb", "gpu": 1})
    assert conf == {"spark.executor.cores": "2",
                    "spark.executor.memory": "2048m",
                    "spark.task.resource.gpu.amount": "1"}
    with pytest.raises(ValueError):
        to_spark_conf({"flux_capacitors": 1})
