"""CLI parity surface: the reference is *driven* as ``./wordcount
files...`` writing DJB2 shards (distwc.c:37-39); a migrating user gets
``python -m multithreaded_map_reduce_library_spark wordcount`` with the
same defaults (10 shards) plus ``run``/``list`` over the registry."""

from __future__ import annotations

import glob
import os
from collections import Counter

import pytest

from multithreaded_map_reduce_library_spark.__main__ import main
from tests.conftest import SF_SMALL
from tests.test_wordcount import REFERENCE_SAMPLES


@pytest.fixture(scope="module")
def sample_files():
    files = sorted(glob.glob(os.path.join(REFERENCE_SAMPLES, "sample*.txt")))
    if not files:
        pytest.skip("reference sample_inputs not present")
    return files


def _read_shards(outdir: str) -> tuple[Counter, int]:
    counts: Counter = Counter()
    shard_dirs = sorted(glob.glob(os.path.join(outdir, "pid=*")))
    for sd in shard_dirs:
        for f in glob.glob(os.path.join(sd, "part-*")):
            with open(f) as fh:
                for line in fh:
                    k, v = line.rstrip("\n").rsplit(": ", 1)
                    counts[k] += int(v)
    return counts, len(shard_dirs)


@pytest.mark.parametrize("engine", ["dataframe", "rdd"])
def test_cli_wordcount_engines(spark, sample_files, tmp_path, engine):
    # `spark` fixture keeps the session config; the CLI reuses the live
    # session via getOrCreate, same as a second job in one application.
    out = str(tmp_path / engine)
    rc = main(
        ["wordcount", *sample_files, "-o", out, "--engine", engine]
    )
    assert rc == 0
    if engine == "rdd":
        # mr facade writes flat part files (one per DJB2 shard)
        counts: Counter = Counter()
        for f in glob.glob(os.path.join(out, "part-*")):
            with open(f) as fh:
                for line in fh:
                    k, v = line.rstrip("\n").rsplit(": ", 1)
                    counts[k] += int(v)
    else:
        counts, n_shards = _read_shards(out)
        assert n_shards <= 10
    assert len(counts) == 21
    assert all(c == 5000 for c in counts.values())


def test_cli_run_and_list(spark, tmp_path, capsys):
    assert main(["list"]) == 0
    listed = capsys.readouterr().out
    assert "q1_pricing_summary" in listed and "[oracle]" in listed

    out = str(tmp_path / "q1")
    rc = main(
        ["run", "q1_pricing_summary", "--sf-dir", SF_SMALL, "-o", out]
    )
    assert rc == 0
    assert glob.glob(os.path.join(out, "*.parquet"))

    assert main(["run", "no_such_query"]) == 2
