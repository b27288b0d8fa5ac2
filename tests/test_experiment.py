"""Experiment analysis: significance must be symmetric at the critical
boundary.

The z statistic is floor-quantized to micro-units for cross-engine
parity. Flooring the SIGNED z before taking |.| is asymmetric: a
negative z in (-1.96, -1.959999] floors to -1960000 and flags
significant while the mirrored positive z does not. The fix quantizes
the magnitude — floor(|z| * 1e6) — and these tests pin the boundary
from both sides with real hash-assigned arms.

Counts chosen by exhaustive search: n_a = n_b = 417 users, 86 vs 110
converters gives z = -1.9599991905 — inside the formerly-asymmetric
window (|z| < 1.96 but floor(z * 1e6) = -1960000).
"""

from __future__ import annotations

import hashlib

from w_userflow_featurestore_spark.operators.experiment import (
    ab_test_summary,
)

N_PER_ARM = 417


def _uids_by_arm(salt: str = "ab"):
    """Python twin of ab_assign (md5-60bit mod 2) to place users."""
    a0, a1 = [], []
    uid = 0
    while len(a0) < N_PER_ARM or len(a1) < N_PER_ARM:
        uid += 1
        h = int(hashlib.md5(f"{salt}:{uid}".encode()).hexdigest()[:15], 16)
        (a0 if h % 2 == 0 else a1).append(uid)
    return a0[:N_PER_ARM], a1[:N_PER_ARM]


def _events(spark, conv_a: int, conv_b: int):
    a0, a1 = _uids_by_arm()
    rows = []
    eid = 0
    for uids, n_conv in ((a0, conv_a), (a1, conv_b)):
        for i, uid in enumerate(uids):
            eid += 1
            etype = "purchase" if i < n_conv else "view"
            rows.append((eid, uid, etype))
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string")


def test_boundary_z_not_significant_either_direction(spark):
    # z = -1.95999919...: |z| < 1.96, so NOT significant — and the
    # mirrored arm order must agree (this was the asymmetric case)
    neg = ab_test_summary(_events(spark, 86, 110)).first()
    assert (neg["n_a"], neg["n_b"]) == (N_PER_ARM, N_PER_ARM)
    assert neg["z_micro"] == -1960000  # signed floor, reporting only
    assert neg["significant"] == 0

    pos = ab_test_summary(_events(spark, 110, 86)).first()
    assert pos["z_micro"] == 1959999
    assert pos["significant"] == 0


def test_clearly_significant_still_flags(spark):
    res = ab_test_summary(_events(spark, 40, 160)).first()
    assert res["significant"] == 1
    assert res["z_micro"] < -1960000


def test_degenerate_pooled_rate_yields_nulls(spark):
    res = ab_test_summary(_events(spark, 0, 0)).first()
    assert res["z_micro"] is None and res["significant"] is None
