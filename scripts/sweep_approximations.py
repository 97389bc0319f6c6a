#!/usr/bin/env python
"""Adversarial A/B sweep of the TPU fast-path approximation stack
(VERDICT r2 weak #4): each approximation toggled individually, the full
production bundle, and the `reference_exact` bundle, across synthetic
scenes (smooth / cliff / occluder) and noise levels, ATE-scored on the
oracle pipeline.

Usage: python scripts/sweep_approximations.py [--frames N] [--seed S]
Writes a markdown table to stdout (recorded in STATUS.md).
"""

import argparse
import copy
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=14)
    ap.add_argument("--seed", type=int, default=2)
    ap.add_argument("--noise", type=float, default=0.0,
                    help="pointmap noise std (OracleEngine)")
    ap.add_argument("--res", type=int, nargs=2, default=[48, 64],
                    metavar=("H", "W"),
                    help="scene resolution (VERDICT r3 next #5: run at "
                         "384 512 to validate the production defaults at "
                         "real match statistics — host-side, slow)")
    ap.add_argument("--variants", default="",
                    help="comma-separated variant-name filter (default "
                         "all)")
    ap.add_argument("--scenes", default="",
                    help="comma-separated scene filter (default all; "
                         "one-scene-per-process dodges the known CPU-XLA "
                         "teardown segfault after ~15 in-process runs)")
    ap.add_argument("--loop-closure", action="store_true",
                    help="closed-loop fixture with oracle retrieval + "
                         "descriptor export: A/Bs the retrieval-edge "
                         "approximations (desc_global vs sym vs "
                         "reference_exact) through real loop-closure "
                         "edges instead of the frontend stack")
    args = ap.parse_args()

    from mast3r_slam_tpu import evaluate
    from mast3r_slam_tpu.pipeline import SLAMSystem
    from mast3r_slam_tpu.testing import OracleEngine, SyntheticSequence
    from mast3r_slam_tpu.utils.config import (apply_reference_exact,
                                              load_config)

    H, W = args.res
    base = load_config("config/eval_no_calib.yaml")
    base["dataset"]["img_size"] = max(H, W)

    if args.loop_closure:
        variants = {
            "production(desc_global)": {},
            "retrieval_edge_mode=sym": {
                ("local_opt", "retrieval_edge_mode"): "sym"},
            "reference_exact": None,
        }
    else:
        variants = {
            "production": {},
            "points_subsample=1": {("local_opt", "points_subsample"): 1},
            "reuse_track_matches=off": {
                ("local_opt", "reuse_track_matches"): False},
            "per-component huber": {("tracking", "joint_ray_huber"): False},
            "occlusion_subsample=2": {
                ("matching", "occlusion_subsample"): 2},
            "reference_exact": None,  # the full exact bundle
        }
    if args.variants:
        keep = {v.strip() for v in args.variants.split(",")}
        variants = {k: v for k, v in variants.items() if k in keep}

    from mast3r_slam_tpu.testing import make_oracle_retrieval

    def run(cfg, seq):
        eng = OracleEngine(seq, noise_std=args.noise,
                           export_desc=args.loop_closure)
        retrieval = make_oracle_retrieval(seq, eng) \
            if args.loop_closure else None
        s = SLAMSystem(cfg, eng, (seq.h, seq.w), buffer=32,
                       retrieval=retrieval)
        for i in range(len(seq)):
            s.process_frame(i, seq.images[i])
        s.terminate()
        d = pathlib.Path(tempfile.mkdtemp())
        evaluate.save_traj(d, "t.txt", seq.timestamps, s.arena)
        seq.write_gt(d / "gt.txt")
        gn = s.tracker.gn_iters_total / max(s.tracker.gn_frames, 1)
        if args.loop_closure:
            print(f"    [desc batches {getattr(s.graph, 'n_desc_batches', 0)}"
                  f" fallbacks {getattr(s.graph, 'n_desc_fallbacks', 0)}"
                  f" retrieval edges {s.stats['retrieval_edges']}]",
                  file=sys.stderr, flush=True)
        return evaluate.ate_rmse(d / "gt.txt", d / "t.txt",
                                 max_diff=0.05), gn

    # per-scene motion scale: the smooth surface tracks so well at 0.45
    # that no second keyframe is ever created (nothing to ATE-score)
    scenes = {"smooth": 0.9, "cliff": 0.45, "occluder": 0.45}
    if args.loop_closure:
        # closed-loop revisit fixture (the make_rates trajectory class)
        scenes = {"smooth": 0.35, "cliff": 0.3, "occluder": 0.3}
    if args.scenes:
        keep = {x.strip() for x in args.scenes.split(",")}
        scenes = {k: v for k, v in scenes.items() if k in keep}
    rows = []
    for scene, tscale in scenes.items():
        seq = SyntheticSequence(n_frames=args.frames, h=H, w=W,
                                seed=args.seed, traj_scale=tscale,
                                scene=scene, loop=args.loop_closure,
                                cycles=2 if args.loop_closure else 1)
        row = {}
        for name, mods in variants.items():
            cfg = copy.deepcopy(base)
            if mods is None:
                cfg = apply_reference_exact(cfg)
            else:
                for (a, b), v in mods.items():
                    cfg[a][b] = v
            row[name], gn = run(cfg, seq)
            print(f"  {scene:9s} {name:24s} ATE {row[name]:.4f} "
                  f"gn_iters {gn:.1f}", file=sys.stderr, flush=True)
        rows.append((scene, row))

    print(f"\n| scene | " + " | ".join(variants) + " |")
    print("|---" * (len(variants) + 1) + "|")
    for scene, row in rows:
        print(f"| {scene} | " + " | ".join(
            f"{row[k]:.4f}" for k in variants) + " |")


if __name__ == "__main__":
    main()
