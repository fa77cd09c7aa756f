"""Round-close verification draw (round-12, VERDICT r11 task 1).

The correctness gate's residual risk is coverage-shaped: most query
names have never been drawn by the DRIVER's per-round sample, so
their evidence is the builder's own full sweep plus judge draws. The
r11 verdict asks the builder to drain that pool deliberately: draw
40+ names per close, md5-seeded from the never-driver-sampled list
minus everything already verified by anyone, archive per-name
results, and refresh the manifest.

This script:
 1. refreshes ``driver_sampled_through_r11`` /
    ``never_driver_sampled_through_r11`` from CORRECTNESS_r11.json;
 2. computes the draw pool = never-driver-sampled minus the
    verified union (driver ∪ judge r11 ∪ builder r11 draws);
 3. draws the first ``N_DRAW`` names by ascending
    ``md5('r12-close:<name>')`` plus the round-12 additions;
 4. runs scripts/check_correctness.py on the draw at sf0.01 and
    archives the log to ``scripts/close_draw_r12.log``;
 5. writes the refreshed manifest fields back to BASELINE.json.

Usage: python scripts/close_draw.py [--dry-run] [--second]

``--second`` runs the final-code draw: seed ``r12-close-2``,
pool additionally excludes draw #1's names, manifest key
``builder_close_draw2_r12``, log ``close_draw2_r12.log`` — the
same two-draw pattern round 11 closed with.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

sys.path.insert(0, ".")

N_DRAW = 40

#: Judge-run verifications from VERDICT.md round 11 (sections 2-3).
JUDGE_R11 = [
    "text_pack_sequences", "mm_audio_adpcm_decode", "text_chunk_windows",
    "text_boilerplate_chunks", "text_curriculum_phases",
    "mm_video_phash_dedup", "mm_payload_entropy", "q_events_active_users",
    "text_rake_keywords", "text_bpe_compression_curve",
    "stream_windowed_distinct", "sim_search_ndcg",
    "embedding_sign_quantization", "graph_adamic_adar",
    "q_events_markov_stationary", "graph_bfs_levels",
    "mm_image_decode_pgm", "mm_image_decode_tga", "q_events_cuped",
]

ROUND12_ADDITIONS = [
    "mm_audio_decode_flac",
    "q_events_did",
    "embedding_topk_margin",
    "text_tokenizer_fertility",
    # late round-12 batch (added after draw #1 ran; --second picks
    # up whichever additions draw #1 didn't cover)
    "q_events_uplift_deciles",
    "q_orders_hill_tail_index",
    "mm_image_decode_ppm",
]


def main() -> int:
    import __spark_entry__ as e

    all_names = sorted(e.queries())
    with open("BASELINE.json") as f:
        manifest = json.load(f)
    with open("CORRECTNESS_r11.json") as f:
        c11 = json.load(f)
    r11_names = sorted(k for k in c11 if isinstance(c11[k], dict))

    sampled = sorted(
        set(manifest["driver_sampled_through_r10"]) | set(r11_names)
    )
    never = sorted(set(all_names) - set(sampled))
    verified = (
        set(manifest["verified_union_through_r10"])
        | set(r11_names)
        | set(JUDGE_R11)
        | set(manifest["builder_close_draw_r11"]["names"])
        | set(manifest["builder_close_draw2_r11"]["names"])
    )
    second = "--second" in sys.argv
    if second and "builder_close_draw_r12" in manifest:
        verified |= set(manifest["builder_close_draw_r12"]["names"])
    pool = [n for n in never if n not in verified]

    seed = "r12-close-2" if second else "r12-close"

    def key(name: str) -> str:
        return hashlib.md5(f"{seed}:{name}".encode()).hexdigest()

    drawn = sorted(pool, key=key)[:N_DRAW]
    covered = set(drawn) | (
        set(manifest["builder_close_draw_r12"]["names"])
        if second and "builder_close_draw_r12" in manifest
        else set(drawn)
    )
    draw = drawn + [n for n in ROUND12_ADDITIONS if n not in covered]
    print(
        f"pool={len(pool)} never={len(never)} sampled={len(sampled)}"
        f" draw={len(draw)}"
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
        "scripts/close_draw2_r12.log" if second
        else "scripts/close_draw_r12.log"
    )
    with open(log_name, "w") as f:
        f.write(log)
    tail = [ln for ln in proc.stdout.splitlines() if ln.strip()][-1:]
    n_pass = sum(1 for ln in proc.stdout.splitlines()
                 if ln.startswith("PASS "))
    n_fail = sum(1 for ln in proc.stdout.splitlines()
                 if ln.startswith("FAIL "))
    print(f"draw result: {n_pass} pass, {n_fail} fail — {tail}")

    manifest["driver_sampled_through_r11"] = sampled
    manifest["never_driver_sampled_through_r11"] = never
    manifest["judge_verified_r11"] = sorted(set(JUDGE_R11))
    manifest["verified_union_through_r11"] = sorted(
        verified | set(sampled)
    )
    draw_key = (
        "builder_close_draw2_r12" if second else "builder_close_draw_r12"
    )
    manifest[draw_key] = {
        "seed": (
            f"md5('{seed}:<name>') ascending, first {N_DRAW} of the "
            "never-driver-sampled pool minus all previously verified "
            "names"
            + (" and draw #1 (final-code draw)" if second
               else ", plus the round-12 additions")
        ),
        "names": draw,
        "result": (
            f"{n_pass}/{len(draw)} pass (rows+schema+hash) at sf0.01"
            + (f", {n_fail} FAIL" if n_fail else "")
            + (" on the final round-12 code" if second else "")
        ),
    }
    manifest["rotation_note_r12"] = (
        "Please prioritize never_driver_sampled_through_r11 in the "
        "r12 sample; round-12 additions (mm_audio_decode_flac, "
        "q_events_did, embedding_topk_margin, "
        "text_tokenizer_fertility) are also never-sampled."
    )
    with open("BASELINE.json", "w") as f:
        json.dump(manifest, f, indent=1)
    print("BASELINE.json manifest refreshed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
