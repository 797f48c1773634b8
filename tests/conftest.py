"""Shared fixtures: one local SparkSession per test session, plus
synthetic annotation fixtures for inputs absent from the reference
snapshot (FIXTURES.md §6).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from geniepool_etl_spark.session import get_spark

# Reference test fixtures (read-only).
REFERENCE_INPUT = "/root/reference/src/test/resources/input"

TESTDATA_ROOT = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMALL = f"{TESTDATA_ROOT}/sf0.001"
SF_ORACLE = f"{TESTDATA_ROOT}/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="geniepool-etl-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def alpha_dir(tmp_path_factory) -> str:
    """Synthetic AlphaMissense fixture.

    The real alpha parquet blobs are absent from the reference snapshot
    (.MISSING_LARGE_BLOBS); schema per FIXTURES.md §6: one row per
    position, columns POS/A/C/G/T, the reference base's own column = 0.
    File name carries the chromosome (``1.parquet`` → chr1).

    Positions chosen to hit the hg19 VCF fixtures: 11301714 (ref A —
    column A = 0) plus one row whose ref column is non-zero (score must
    come out null) and one position absent from the VCFs.
    """
    d = tmp_path_factory.mktemp("alpha") / "hg-19"
    d.mkdir()
    table = pa.table(
        {
            "POS": pa.array([11301714, 45796269, 999999999], pa.int64()),
            "A": pa.array([0.0, 0.7, 0.1], pa.float64()),
            "C": pa.array([0.2, 0.6, 0.2], pa.float64()),
            "G": pa.array([0.9, 0.5, 0.3], pa.float64()),  # A->G at 11301714 = 0.9
            "T": pa.array([0.4, 0.4, 0.4], pa.float64()),
        }
    )
    pq.write_table(table, d / "1.parquet")
    return str(d)


def _alpha_table(positions: list[int]) -> pa.Table:
    return pa.table(
        {
            "POS": pa.array(positions, pa.int64()),
            "A": pa.array([0.1] * len(positions), pa.float64()),
            "C": pa.array([0.0] * len(positions), pa.float64()),
            "G": pa.array([0.3] * len(positions), pa.float64()),
            "T": pa.array([0.4] * len(positions), pa.float64()),
        }
    )


@pytest.fixture(scope="session")
def alpha_hg38_dir(tmp_path_factory) -> str:
    """Synthetic hg38 AlphaMissense dir (blobs absent from snapshot)."""
    d = tmp_path_factory.mktemp("alpha") / "hg-38"
    d.mkdir()
    pq.write_table(_alpha_table([25240000, 162778659]), d / "1.parquet")
    return str(d)


@pytest.fixture(scope="session")
def alpha_t2t_dir(tmp_path_factory) -> str:
    """Synthetic CHM13v2 AlphaMissense dir (blobs absent from snapshot)."""
    d = tmp_path_factory.mktemp("alpha") / "chm13-v2"
    d.mkdir()
    # ref=C at 805837 (C column 0) → alt=A selects column A = 0.1
    pq.write_table(_alpha_table([805837, 730107]), d / "1.parquet")
    return str(d)


@pytest.fixture(scope="session")
def gnomad_t2t_dir(tmp_path_factory) -> str:
    """Synthetic gnomAD4 CHM13v2 dir (absent from snapshot,
    .MISSING_LARGE_BLOBS). Shape per reference M:238-246; the
    ``hg38_coordinates`` column is deliberately omitted from the file
    to exercise the missing-column-reads-null subtlety."""
    d = tmp_path_factory.mktemp("gnomad4")
    table = pa.table(
        {
            "POS": pa.array([805837, 774091], pa.int64()),
            "REF": pa.array(["C", "G"], pa.string()),
            "ALT": pa.array(["A", "A"], pa.string()),
            "gnomad_an": pa.array([1000, 2000], pa.int64()),
            "gnomad_ac": pa.array([10, 20], pa.int64()),
            "gnomad_nhomalt": pa.array([1, 2], pa.int64()),
        }
    )
    pq.write_table(table, str(d / "c1_780m.parquet"))
    return str(d)
