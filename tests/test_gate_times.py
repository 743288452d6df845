"""Gate-time regression policy (r11 verdict item 3): the committed
GATE_TIMES_r{N}.json artifacts are the best detector for quadratic
expression bombs (the trim-HOF bug surfaced as a 13.7 s outlier for
500 docs), so the diff policy is a standing pytest — any entry >3× its
prior committed gate time AND above the 2 s noise floor fails here.

The artifact pair is auto-discovered: the two highest-round
GATE_TIMES_r*.json files in the repo root. With fewer than two
artifacts the policy test skips (nothing to diff yet)."""

from __future__ import annotations

import glob
import json
import os
import re

import pytest

sys_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from tools.diff_gate_times import (  # noqa: E402
    FLOOR,
    RATIO,
    WAIVED,
    compare,
    waived_entries,
)


def _artifacts() -> list[tuple[int, str]]:
    out = []
    for p in glob.glob(os.path.join(sys_root, "GATE_TIMES_r*.json")):
        m = re.search(r"GATE_TIMES_r(\d+)\.json$", p)
        if m:
            out.append((int(m.group(1)), p))
    return sorted(out)


class TestComparePolicy:
    def test_flags_quadratic_blowup_above_floor(self):
        old = {"a": 0.2, "b": 1.0}
        new = {"a": 13.7, "b": 1.1}  # the r11 trim-HOF shape
        reg, _, _ = compare(old, new)
        assert [(n, o, v) for n, o, v in reg] == [("a", 0.2, 13.7)]

    def test_subsecond_noise_band_not_flagged(self):
        # 0.3 s -> 1.5 s is 5x but under the 2 s floor: JVM/box noise
        reg, _, _ = compare({"a": 0.3}, {"a": 1.5})
        assert reg == []

    def test_membership_changes_informational_only(self):
        reg, only_old, only_new = compare({"a": 1.0}, {"b": 1.0})
        assert reg == []
        assert only_old == ["a"] and only_new == ["b"]

    def test_severity_ordering(self):
        old = {"a": 1.0, "b": 1.0}
        new = {"a": 4.0, "b": 20.0}
        reg, _, _ = compare(old, new)
        assert [n for n, _, _ in reg] == ["b", "a"]

    def test_disjoint_artifacts_and_zero_old_time_do_not_crash(self):
        """r12 review: disjoint entry sets made main() divide by zero
        (exit indistinguishable from a policy breach), and a 0.000
        rounded old time crashed the REGRESS print."""
        import subprocess
        import sys as _sys
        import json as _json
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            pa, pb = os.path.join(d, "a.json"), os.path.join(d, "b.json")
            with open(pa, "w") as f:
                _json.dump({"x": 1.0, "z": 0.0}, f)
            with open(pb, "w") as f:
                _json.dump({"y": 1.0, "z": 5.0}, f)
            r = subprocess.run(
                [_sys.executable,
                 os.path.join(sys_root, "tools", "diff_gate_times.py"),
                 pa, pb],
                capture_output=True, text=True,
            )
            # z regresses (0 -> 5 s, above floor): exit 1 by POLICY,
            # with an 'inf' ratio printed — no traceback either way
            assert "Traceback" not in r.stderr
            assert r.returncode == 1 and "inf" in r.stdout


class TestWaivers:
    """A waiver is pinned to ONE (old_round, new_round) artifact pair —
    the same entry regressing again in a later pair must flag again."""

    def test_waiver_applies_only_to_its_pinned_pair(self):
        assert "parts_pareto_skyline" in waived_entries(
            "GATE_TIMES_r11.json", "GATE_TIMES_r12.json"
        )
        assert "parts_pareto_skyline" not in waived_entries(
            "GATE_TIMES_r12.json", "GATE_TIMES_r13.json"
        )

    def test_unparseable_paths_waive_nothing(self):
        assert waived_entries("a.json", "b.json") == set()

    def test_every_waiver_names_its_evidence(self):
        # a waiver without an investigation receipt is just a mute
        # button — require a non-trivial reason on every row
        for key, reason in WAIVED.items():
            assert len(reason) > 40, f"waiver {key} lacks a receipt"


class TestCommittedArtifacts:
    def test_latest_pair_has_no_policy_breach(self):
        arts = _artifacts()
        if len(arts) < 2:
            pytest.skip("fewer than two GATE_TIMES artifacts committed")
        (_, old_path), (_, new_path) = arts[-2], arts[-1]
        with open(old_path) as f:
            old = json.load(f)
        with open(new_path) as f:
            new = json.load(f)
        reg, _, _ = compare(old, new)
        waived = waived_entries(old_path, new_path)
        reg = [r for r in reg if r[0] not in waived]
        assert not reg, (
            f"gate-time policy breach ({RATIO}x over prior, above "
            f"{FLOOR}s floor) between {os.path.basename(old_path)} and "
            f"{os.path.basename(new_path)}: {reg} — investigate for an "
            "O(n^2) expression (QUIRKS #13) before re-baselining"
        )
