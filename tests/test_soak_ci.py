"""Bounded in-suite run of the external-format churn soak (VERDICT
r10 item 3): the long receipts in BENCH_NOTES are tool-run; CI must
re-exercise the same four racing actors — exactly-once sink with
doubled batches + stale replays, paced streaming reader, maintenance
cycler, time-travel reader — and the same invariants (exactly-once at
every offset, ledger floor survives maintenance, final scan == the
produced set) on every full run.

Bounded: a handful of rounds per format, the soak's own default
pacing. The POSIX legs pin the classic chain; the fake-store legs pin
the round-11 write seam (the whole chain against an object-store root
with no POSIX path, reader workers on the pickled store).
"""

import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
    ),
)

from soak_external import soak_delta, soak_iceberg  # noqa: E402

ROUNDS = int(os.environ.get("SPARK_GRAFT_SOAK_CI_ROUNDS", "8"))


def test_soak_delta_posix(spark):
    res = soak_delta(spark, ROUNDS)
    assert res["rows"] == ROUNDS * 20
    assert res["commits"] >= ROUNDS


def test_soak_iceberg_posix(spark):
    res = soak_iceberg(spark, ROUNDS)
    assert res["rows"] == ROUNDS * 20
    assert res["snapshots_kept"] >= 1


def test_soak_delta_fake_store(spark):
    res = soak_delta(spark, ROUNDS, fake=True)
    assert res["rows"] == ROUNDS * 20
    assert res["store"] == "fake"


def test_soak_iceberg_fake_store(spark):
    res = soak_iceberg(spark, ROUNDS, fake=True)
    assert res["rows"] == ROUNDS * 20
    assert res["store"] == "fake"
