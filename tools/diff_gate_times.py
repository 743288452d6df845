"""Diff two GATE_TIMES_r{N}.json artifacts and flag per-entry wall-time
regressions — the O(n²)-expression detector (r11 lesson: the committed
gate times exposed `docs_trim_quality` at 13.7 s for 500 docs, an
interpreted-HOF bomb invisible to count()/plan inspection, fixed for a
75× win). The r11 verdict asked for this as a standing policy check.

Policy (compare()): flag an entry when

    new > RATIO * old   AND   new > FLOOR seconds

The absolute FLOOR filters the sub-second band where JVM cold-start and
box drift routinely swing 2-3× (memory: single-entry gate timings
bounce 2× day-to-day); a genuine quadratic blowup lands WELL above it
(13.7 s vs 0.2 s). Entries present in only one artifact are reported
informationally, never flagged — the catalog grows every round.

A breach that was INVESTIGATED and measured benign is recorded in
WAIVED, pinned to the exact (old_round, new_round) artifact pair it was
adjudicated for — the waiver silences that one comparison only, so the
same entry regressing again next round flags again. A waiver requires
the investigation receipt in its reason (what was measured, where).

Usage: python tools/diff_gate_times.py OLD.json NEW.json
Exit 1 iff any entry breaches the policy.
"""

from __future__ import annotations

import json
import re
import sys

RATIO = 3.0
FLOOR = 2.0  # seconds

#: (entry, old_round, new_round) -> investigation receipt. r12: all
#: three breaches re-timed warm at sf0.01 AND sf0.1 (flat across the
#: decade, so not QUIRKS-#13-class) — the r11 baselines were captured
#: at decf8b3, BEFORE the 35685a6 two-phase rewrites and before the
#: r12 catalog reorder shifted which entry absorbs Python-worker init.
WAIVED: dict[tuple[str, int, int], str] = {
    ("parts_pareto_skyline", 11, 12):
        "two_phase_prefix_agg rewrite (35685a6, after the r11 gate "
        "capture): fixed checkpoint+range-stats overhead at toy scale; "
        "warm 1.1-1.7s at BOTH sf0.01 and sf0.1 (flat), 1000x-verified "
        "in SCALE.md r12",
    ("lineitem_abc_analysis", 11, 12):
        "same two_phase_prefix_agg rewrite: warm 1.5-1.9s at both "
        "scales, flat across the decade",
    ("multimodal_audio_features", 11, 12):
        "code unchanged since decf8b3 (git diff empty for multimodal); "
        "warm 0.7-0.9s at both scales — the gate number is the "
        "pandas-UDF Python-worker/Arrow init landing on it after the "
        "r12 catalog pruning reordered the gate (the final r12 "
        "recapture moved the init onto image_features instead and "
        "this entry gated at 0.59s — row kept for the record)",
    ("multimodal_image_features", 11, 12):
        "code unchanged; warm 0.64-0.86s at sf0.01 — the same "
        "pandas-worker/Arrow init as the audio row above, relocated "
        "by the KeyedRanges re-arm reorder in the final r12 recapture",
    ("sessionize_events", 11, 12):
        "KeyedRanges segmented-scan rewrite (r12): fixed "
        "checkpoint+control-plane-job overhead at toy scale; warm "
        "3.0-4.1s at sf0.1 = flat vs sf0.01, bit-identical to the "
        "window form at both scales + skew synth (SCALE.md r12)",
    ("window_lag_gap", 11, 12):
        "same KeyedRanges rewrite family: warm flat across the "
        "decade, oracle-green at both scales",
    ("events_scd2_history", 11, 12):
        "same KeyedRanges rewrite family (two segmented scans): warm "
        "2.4s sf0.01 / 4.2s sf0.1 in-gate, oracle-green both scales",
    ("events_gap_fill_ffill", 11, 12):
        "same KeyedRanges rewrite family (prefix_last): oracle-green "
        "both scales, skew smoke 1.1x",
    ("multimodal_sobel_energy", 11, 12):
        "code unchanged this session (bench at the LARGER sf0.1 is "
        "1.18s in the same-day final bench); isolated re-time at "
        "sf0.01: 12.1s first call in a fresh session then 1.4-1.7s "
        "warm x3 — the 5.05s gate number is the codec family's "
        "Python-worker/Arrow + codegen init landing on it in the "
        "final gate-order recapture, the audio/image_features "
        "relocation pattern above",
}


def _round_of(path: str) -> int | None:
    m = re.search(r"GATE_TIMES_r(\d+)\.json$", path)
    return int(m.group(1)) if m else None


def waived_entries(old_path: str, new_path: str) -> set[str]:
    """Entries whose breach is acknowledged for THIS artifact pair."""
    ro, rn = _round_of(old_path), _round_of(new_path)
    if ro is None or rn is None:
        return set()
    return {name for (name, o, n) in WAIVED if (o, n) == (ro, rn)}


def compare(
    old: dict[str, float],
    new: dict[str, float],
    ratio: float = RATIO,
    floor: float = FLOOR,
) -> tuple[list[tuple[str, float, float]], list[str], list[str]]:
    """Return (regressions, only_old, only_new); regressions are
    (name, old_sec, new_sec) sorted by severity (new/old desc)."""
    regressions = [
        (n, old[n], new[n])
        for n in old
        if n in new and new[n] > ratio * old[n] and new[n] > floor
    ]
    regressions.sort(key=lambda t: t[2] / t[1] if t[1] else float("inf"), reverse=True)
    only_old = sorted(n for n in old if n not in new)
    only_new = sorted(n for n in new if n not in old)
    return regressions, only_old, only_new


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    with open(sys.argv[1]) as f:
        old = json.load(f)
    with open(sys.argv[2]) as f:
        new = json.load(f)
    regressions, only_old, only_new = compare(old, new)
    waived = waived_entries(sys.argv[1], sys.argv[2])
    for n, o, v in regressions:
        ratio = f"{v / o:.1f}x" if o else "inf"
        tag = "WAIVED " if n in waived else "REGRESS"
        print(f"{tag}  {n}: {o:.2f}s -> {v:.2f}s ({ratio})")
    regressions = [r for r in regressions if r[0] not in waived]
    if only_old:
        print(f"retired ({len(only_old)}): {', '.join(only_old[:10])}"
              + (" ..." if len(only_old) > 10 else ""))
    if only_new:
        print(f"new ({len(only_new)}): {', '.join(only_new[:10])}"
              + (" ..." if len(only_new) > 10 else ""))
    common = [n for n in old if n in new]
    tot_o = sum(old[n] for n in common)
    tot_n = sum(new[n] for n in common)
    tot_ratio = f"{tot_n / tot_o:.2f}x" if tot_o else "n/a"
    print(
        f"{len(common)} common entries: {tot_o:.0f}s -> {tot_n:.0f}s "
        f"({tot_ratio}); {len(regressions)} policy breaches"
    )
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
