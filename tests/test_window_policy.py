"""Global-window exemption measurement policy (r11 verdict item 8).

The r11 audit showed plan-shape ARGUMENTS for "bounded" window inputs
lose to measurement — five exemptions claimed bounded measured
data-sized and were rewritten. The standing rule (COVERAGE round-12
checklist item 5): any NEW global-window exemption must check in
evidence in WINDOW_MEASUREMENTS.json — either a measured 10x
window-input ratio (tools/measure_window_inputs.py is the template)
or a by-construction bound in a category that cannot scale with data.

These tests make an unmeasured new exemption a FAILING state: adding a
name to ALLOWED_GLOBAL_WINDOW without a measurements row (or vice
versa) goes red here, as does a measured ratio above the flat-ish
threshold or a by-construction claim in a data-adjacent category.
"""

from __future__ import annotations

import json
import os

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _allowed() -> dict[str, str]:
    # imported inside the function: a module-level import of the sweep
    # class would make pytest re-collect its parametrized tests here
    from tests.test_scale_plans import TestGlobalWindowSweep

    return TestGlobalWindowSweep.ALLOWED_GLOBAL_WINDOW

#: Categories whose bound is structural — the window input cannot grow
#: with the data by construction. 'value-domain' and 'global-order' are
#: DELIBERATELY excluded: those are the data-adjacent categories where
#: every r11 false "bounded" claim lived, so they require measurement
#: (the two by-construction value-domain rows below are calendar/horizon
#: sub-bounds and say so in their notes).
_STRUCTURAL = {"calendar", "grid", "alphabet", "summary", "k-row"}

#: Max measured 10x window-input growth accepted as "flat-ish". The
#: r11 survivors measure 1.0-2.7 (the 2.7 is the saturating cents
#: domain); the rewritten offenders measured 10.0-15.4.
_MAX_RATIO = 3.0


def _measurements() -> dict:
    with open(os.path.join(_ROOT, "WINDOW_MEASUREMENTS.json")) as f:
        d = json.load(f)
    d.pop("_doc", None)
    return d


class TestExemptionMeasurementPolicy:
    def test_every_exemption_has_a_measurements_row(self):
        allowed = set(_allowed())
        measured = set(_measurements())
        missing = sorted(allowed - measured)
        assert not missing, (
            f"global-window exemptions without an input-growth evidence "
            f"row in WINDOW_MEASUREMENTS.json: {missing} — measure the "
            "window input at 10x (tools/measure_window_inputs.py) or "
            "state the by-construction bound, BEFORE exempting"
        )

    def test_no_stale_measurement_rows(self):
        allowed = set(_allowed())
        stale = sorted(set(_measurements()) - allowed)
        assert not stale, (
            f"WINDOW_MEASUREMENTS.json rows for names no longer in "
            f"ALLOWED_GLOBAL_WINDOW: {stale} — prune them (the entry "
            "was rewritten windowless or retired)"
        )

    def test_categories_agree_with_sweep_registry(self):
        allowed = _allowed()
        rows = _measurements()
        mismatched = {
            n: (allowed[n], rows[n].get("category"))
            for n in allowed
            if n in rows and rows[n].get("category") != allowed[n]
        }
        assert not mismatched, f"category drift: {mismatched}"

    def test_every_row_declares_a_known_basis(self):
        """A row with a missing or unknown basis would silently bypass
        BOTH policy checks below (each filters on its own basis value)
        — exactly the unmeasured exemption the policy exists to block
        (r12 review finding)."""
        bad = {
            n: r.get("basis")
            for n, r in _measurements().items()
            if r.get("basis") not in ("measured", "by-construction")
        }
        assert not bad, (
            f"WINDOW_MEASUREMENTS.json rows with unknown basis: {bad} — "
            "only 'measured' and 'by-construction' carry policy checks"
        )

    def test_measured_rows_are_flat_ish(self):
        bad = {
            n: r.get("ratio_at_10x")
            for n, r in _measurements().items()
            if r.get("basis") == "measured"
            and not (
                isinstance(r.get("ratio_at_10x"), (int, float))
                and r["ratio_at_10x"] <= _MAX_RATIO
                and isinstance(r.get("round"), int)
            )
        }
        assert not bad, (
            f"measured exemptions missing a valid ratio/round or above "
            f"the {_MAX_RATIO}x threshold: {bad} — a data-sized window "
            "input gets the two_phase_rank/two_phase_prefix_agg "
            "treatment, not an exemption"
        )

    def test_by_construction_rows_are_structurally_bounded(self):
        bad = {}
        for n, r in _measurements().items():
            if r.get("basis") != "by-construction":
                continue
            cat = r.get("category")
            note = r.get("note", "")
            if cat in _STRUCTURAL:
                ok = bool(note)
            else:
                # data-adjacent category claiming a construction bound:
                # the note must name a structural sub-bound (the
                # kaplan-meier horizon / theilsen day-pair cases)
                ok = any(
                    w in note.lower()
                    for w in ("calendar", "horizon", "day pair", "k-row")
                )
            if not ok:
                bad[n] = (cat, note)
        assert not bad, (
            f"by-construction exemption rows without a structural bound "
            f"or naming note: {bad}"
        )
