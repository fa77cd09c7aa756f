"""Round-close verification draw (round-13 edition).

Round 12 DRAINED the never-verified pool: every one of the 379
then-existing names carries a named per-query instrument (driver /
judge / seeded draw / drain). The close-draw discipline continues,
but its job shifts from draining to ROTATION: each close draws a
fresh md5-seeded sample over the FULL inventory (keeping old rows
re-verified on current code so a regression in a long-untouched
operator cannot hide behind a stale instrument) plus every
round-13 addition.

This script:
 1. refreshes ``driver_sampled_through_r12`` /
    ``never_driver_sampled_through_r12`` from CORRECTNESS_r12.json;
 2. draws the first ``N_DRAW`` names by ascending
    ``md5('r13-close:<name>')`` over the full inventory, plus the
    round-13 additions;
 3. runs scripts/check_correctness.py on the draw at sf0.01 and
    archives the log to ``scripts/close_draw_r13.log``;
 4. writes the refreshed manifest fields back to BASELINE.json.

Usage: python scripts/close_draw.py [--dry-run] [--second]

``--second`` runs the final-code draw: seed ``r13-close-2``, the
draw excludes draw #1's names, manifest key
``builder_close_draw2_r13``, log ``close_draw2_r13.log``.
"""

from __future__ import annotations

import hashlib
import json
import subprocess
import sys

sys.path.insert(0, ".")

N_DRAW = 40

#: Judge-run verifications from VERDICT.md round 12 (sections 2-3):
#: the 7 round-12 additions + the judge's fresh 14-name draw
#: (seed judge-r12).
JUDGE_R12 = [
    "q_events_did", "q_events_uplift_deciles",
    "q_orders_hill_tail_index", "mm_audio_decode_flac",
    "mm_image_decode_ppm", "embedding_topk_margin",
    "text_tokenizer_fertility",
    "q_events_seasonal_strength", "mm_audio_silence_trim",
    "q_part_price_index", "mm_decode_router", "text_span_keepset",
    "text_perplexity_filter_curve", "q_customer_abc_classes",
    "text_zipf_fit", "text_bpe_vocab", "q_lineitem_mode_stats",
    "text_span_dedup", "q_tpch02_min_cost_supplier",
    "graph_rich_club", "q_events_asof_join",
]

ROUND13_ADDITIONS = [
    "mm_audio_decode_flac_stereo",
    "text_fertility_by_lang",
    "q_join_skew_report",
    "layout_zorder_pruning",
    "mm_video_motion_estimate",
    "embedding_participation_ratio",
    "text_watermark_detect",
    "q_events_markov_attribution",
    "sim_search_ivf_imbalance",
]


def main() -> int:
    import __spark_entry__ as e

    all_names = sorted(e.queries())
    with open("BASELINE.json") as f:
        manifest = json.load(f)
    with open("CORRECTNESS_r12.json") as f:
        c12 = json.load(f)
    r12_names = sorted(k for k in c12 if isinstance(c12[k], dict))

    sampled = sorted(
        set(manifest["driver_sampled_through_r11"]) | set(r12_names)
    )
    never = sorted(set(all_names) - set(sampled))
    # Post-drain, the never-VERIFIED pool is empty for pre-r13 names;
    # the rotation draw runs over the full inventory instead.
    second = "--second" in sys.argv
    exclude: set[str] = set()
    if second and "builder_close_draw_r13" in manifest:
        exclude = set(manifest["builder_close_draw_r13"]["names"])

    seed = "r13-close-2" if second else "r13-close"

    def key(name: str) -> str:
        return hashlib.md5(f"{seed}:{name}".encode()).hexdigest()

    pool = [n for n in all_names if n not in exclude]
    drawn = sorted(pool, key=key)[:N_DRAW]
    covered = set(drawn) | exclude
    draw = drawn + [n for n in ROUND13_ADDITIONS if n not in covered]
    print(
        f"inventory={len(all_names)} never_sampled={len(never)}"
        f" sampled={len(sampled)} draw={len(draw)}"
    )
    for n in draw:
        print(" ", n)
    if "--dry-run" in sys.argv:
        return 0

    proc = subprocess.run(
        [sys.executable, "scripts/check_correctness.py",
         "/root/testdata/sf0.01", *draw],
        capture_output=True, text=True,
    )
    log = proc.stdout + proc.stderr
    log_name = (
        "scripts/close_draw2_r13.log" if second
        else "scripts/close_draw_r13.log"
    )
    with open(log_name, "w") as f:
        f.write(log)
    tail = [ln for ln in proc.stdout.splitlines() if ln.strip()][-1:]
    n_pass = sum(1 for ln in proc.stdout.splitlines()
                 if ln.startswith("PASS "))
    n_fail = sum(1 for ln in proc.stdout.splitlines()
                 if ln.startswith("FAIL "))
    print(f"draw result: {n_pass} pass, {n_fail} fail — {tail}")

    manifest["driver_sampled_through_r12"] = sampled
    manifest["never_driver_sampled_through_r12"] = never
    manifest["judge_verified_r12"] = sorted(set(JUDGE_R12))
    manifest["verified_union_through_r12"] = sorted(
        set(manifest["verified_union_through_r11"])
        | set(r12_names)
        | set(JUDGE_R12)
        | set(manifest["builder_close_draw_r12"]["names"])
        | set(manifest["builder_close_draw2_r12"]["names"])
        | set(manifest["builder_pool_drain_r12"]["names"])
    )
    draw_key = (
        "builder_close_draw2_r13" if second else "builder_close_draw_r13"
    )
    manifest[draw_key] = {
        "seed": (
            f"md5('{seed}:<name>') ascending, first {N_DRAW} of the "
            "full inventory (post-drain rotation draw)"
            + (" minus draw #1 (final-code draw)" if second
               else ", plus the round-13 additions")
        ),
        "names": draw,
        "result": (
            f"{n_pass}/{len(draw)} pass (rows+schema+hash) at sf0.01"
            + (f", {n_fail} FAIL" if n_fail else "")
            + (" on the final round-13 code" if second else "")
        ),
    }
    manifest["rotation_note_r13"] = (
        "All pre-r13 names verified (r12 drain); round-13 additions ("
        + ", ".join(ROUND13_ADDITIONS)
        + ") are never-driver-sampled — please prioritize them in "
        "the r13 sample."
    )
    with open("BASELINE.json", "w") as f:
        json.dump(manifest, f, indent=1)
    print("BASELINE.json manifest refreshed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
