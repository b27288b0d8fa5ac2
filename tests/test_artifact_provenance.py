"""Committed-artifact provenance: 'recorded on the round's final code'
must be a checkable claim, not a commit-message assertion.

Round 7's selfcheck was committed, then an operator changed, and the
final commit claimed (unverifiably) that the artifact was re-recorded —
git cannot distinguish a re-run that produced byte-identical output
from no re-run at all (round-7 verdict, What's wrong #1). The writers
now stamp ``git rev-parse HEAD`` + a dirty-tree flag into every
recorded JSON; these tests pin the protocol:

 * the stamp helper reports this checkout faithfully,
 * the selfcheck writer refuses a dirty tree, and
 * every committed round snapshot that carries a ``head`` field was
   recorded at the commit that introduced it or its parent (i.e. the
   artifact's code state is exactly the committed code next to it),
   with ``dirty`` false.

Pre-round-8 snapshots carry no ``head`` field and are skipped — the
protocol cannot be retrofitted onto history.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _git(*args: str) -> str:
    return subprocess.run(["git", *args], cwd=REPO, capture_output=True,
                          text=True, check=True).stdout.strip()


def _have_git() -> bool:
    try:
        _git("rev-parse", "HEAD")
        return True
    except Exception:  # noqa: BLE001
        return False


def test_git_provenance_reports_this_checkout():
    import sys
    sys.path.insert(0, REPO)
    from bench import git_provenance
    if not _have_git():
        pytest.skip("not a git checkout")
    prov = git_provenance()
    assert prov["head"] == _git("rev-parse", "HEAD")
    assert prov["dirty"] == bool(_git("status", "--porcelain"))


@pytest.mark.parametrize("pattern", ["SELFCHECK_r*.json",
                                     "BENCH_DETAIL_r*.json"])
def test_committed_snapshots_match_their_introducing_commit(pattern):
    """For every committed round snapshot with a ``head`` stamp: the
    recording HEAD must be the commit that (last) touched the artifact
    — or that commit's parent, the normal flow where the artifact is
    recorded on clean HEAD H and committed as H's child — and the tree
    must have been clean. Any other relationship means code changed
    between the recording and the commit that published it."""
    if not _have_git():
        pytest.skip("not a git checkout")
    checked = 0
    for path in sorted(glob.glob(os.path.join(REPO, pattern))):
        with open(path) as fh:
            art = json.load(fh)
        if "head" not in art:
            continue                     # pre-protocol snapshot
        name = os.path.basename(path)
        # uncommitted artifact (being recorded right now): the live
        # stamp is checked by the writer itself; only published
        # history is pinned here
        introduced = _git("log", "-1", "--format=%H", "--", name)
        if not introduced:
            continue
        # artifact content at the introducing commit (the working-tree
        # copy may be a newer, not-yet-committed recording)
        blob = _git("show", f"{introduced}:{name}")
        committed = json.loads(blob)
        if "head" not in committed:
            continue
        assert committed["dirty"] is False, name
        parent = _git("rev-parse", f"{introduced}^")
        assert committed["head"] in (introduced, parent), (
            f"{name}: recorded at {committed['head'][:12]} but "
            f"introduced by {introduced[:12]} (parent {parent[:12]}) — "
            f"code moved between recording and publishing")
        checked += 1
    # protocol is active from round 8 on; until the first stamped
    # snapshot is committed this test vacuously passes (checked == 0)
    assert checked >= 0


def test_newest_selfcheck_covers_the_current_registry():
    """Round 7 and round 8 both ended with a code commit landing AFTER
    the recorded selfcheck, so the committed artifact silently covered
    n-1 of the n queries at HEAD (round-8 verdict, What's wrong #1).
    The write-time guard can't catch that — it checks coverage at
    recording time. This closes the ordering loophole from the other
    side: the NEWEST committed selfcheck must cover the CURRENT query
    registry exactly, which mechanically forces a fresh selfcheck as
    the final commit after ANY query addition or removal. (Expected to
    fail mid-round from the moment a query lands until the round's
    closing selfcheck is recorded — that failure is the enforcement.)"""
    import sys
    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod

    def _round(path: str) -> int:
        m = re.search(r"SELFCHECK_r(\d+)\.json$", path)
        return int(m.group(1))

    paths = sorted(glob.glob(os.path.join(REPO, "SELFCHECK_r*.json")),
                   key=_round)
    assert paths, "no committed selfcheck artifact"
    newest = paths[-1]
    with open(newest) as fh:
        art = json.load(fh)
    registry = set(entrymod.queries())
    covered = set(art["results"])
    assert art["n_queries"] == len(covered)
    missing = sorted(registry - covered)
    stale = sorted(covered - registry)
    assert covered == registry, (
        f"{os.path.basename(newest)} does not describe the current "
        f"registry: missing={missing[:5]} stale={stale[:5]} — record a "
        f"fresh selfcheck as the round's final commit")
