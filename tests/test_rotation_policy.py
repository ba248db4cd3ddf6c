"""Rotation bookkeeping must be driven by the committed CORRECTNESS_r0N
files, not memory (VERDICT r3 finding #3: r3's rotation comment called
four `err: no_oracle` rows "r1-green").  This test recomputes the union
of driver-green rows from the committed round files and asserts the
current _PRIORITY_50 window only spends slots on queries that still
need an independent driver row."""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# r3's six dtype-red rows (values exact, oracle returned float64 for
# integer columns) — CAST-fixed this round, so they re-enter the window
# for a fresh driver row even though they were "checked" before.
R3_DTYPE_RED = {
    "cv_stats", "r_bt_arena", "t_doremi", "t_bm25", "t_bleu_stats",
    "g_pagerank",
}


def _driver_green_union():
    greens = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r0*.json"))):
        rows = json.load(open(path))
        for name, v in rows.items():
            if v.get("err"):
                continue
            if (v.get("rows_match") and v.get("schema_match")
                    and v.get("hash_match") is True):
                greens.add(name)
    return greens


def test_priority_window_size():
    assert len(entrymod._PRIORITY_50) == 50
    assert len(set(entrymod._PRIORITY_50)) == 50


def test_priority_entries_exist():
    q = set(entrymod.queries())
    missing = [n for n in entrymod._PRIORITY_50 if n not in q]
    assert not missing, missing
    o = set(entrymod.oracle_sql())
    no_oracle = [n for n in entrymod._PRIORITY_50 if n not in o]
    assert not no_oracle, no_oracle


def test_no_slot_wasted_on_already_green():
    """Every window slot goes to a query that has never had a green
    driver row, or to one of r3's dtype-red rows being re-proven."""
    greens = _driver_green_union()
    wasted = [n for n in entrymod._PRIORITY_50
              if n in greens and n not in R3_DTYPE_RED]
    assert not wasted, f"slots wasted on already-driver-green: {wasted}"


def test_deferred_queries_are_documented():
    """Whatever is neither driver-green nor in this round's window must
    be a known low-risk deferral (checked by the sf0.001 pytest mirror
    and the sf0.01 full-registry mirror every session)."""
    greens = _driver_green_union()
    q = set(entrymod.queries())
    deferred = sorted(q - greens - set(entrymod._PRIORITY_50) - R3_DTYPE_RED)
    # cumulative coverage after a clean r4 run: len(queries) - len(deferred)
    assert len(deferred) <= 19, deferred
    expected_r5 = {
        "q11_important_parts", "q12_late_shipping", "q13_order_distribution",
        "q17_small_qty_revenue", "q20_excess_suppliers", "q21_waiting_suppliers",
        "t_c4_rules", "t_char_entropy", "t_chunk_windows", "t_clean",
        "t_fix_text", "t_gate_agreement", "t_length_buckets",
        "t_pack_chunks", "t_readability", "t_repetition", "t_url_canon",
        # round-4 additions (post-window): sf0.01-mirror-green on landing,
        # first driver slot in r5
        "d_editdist", "cv_refusals",
    }
    assert set(deferred) <= expected_r5, set(deferred) - expected_r5
