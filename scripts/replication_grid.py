#!/usr/bin/env python
"""Replicate the reference's committed T x N uncertainty-analysis grid.

The reference ships 13 analysis configs under /root/reference/uncertainty/
(EX/MA x T{1.0,2.0} x N{3,5,10,15} plus latent-injection ablations), each an
`analysis_metrics.csv` from its analyze_model.py protocol.  This drive runs
the SAME protocol (library call: vaeunet_tpu.analysis.analyze.analyze_model,
N tempered samples, tiled 512 inference, global-0.5 threshold) for every
config against our trained members and writes same-schema CSVs under
--output-dir, so each reference config has a one-to-one counterpart.

Model specs (repeatable):
  --model EX=checkpoints/r4_a2e4/...@0.5
  --model EXnolatent=checkpoints/r4_nolat/...@0.5
  --model MA=checkpoints/r4_ma1/...@1.0

Config mapping (suffix -> model key):
  EX_T{t}_N{n}            -> EX
  EX_T1.0_N15_nolatent    -> EXnolatent   (latent_injection='none' member)
  EX_T2.0_N5_latent       -> EXlatent     (latent_injection='bottleneck')
  MA_T{t}_N{n}            -> MA
Configs whose model spec is missing are skipped with a notice (so the grid
can be produced incrementally as members land).

ONE TPU process; global plot stage disabled (global_plots=False) — the
deliverable is the per-config CSV.  Existing non-empty CSVs are skipped, so
an interrupted grid resumes.
"""

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts.drive_common import DATA_DIR, probe_tpu  # noqa: E402

# (dirname, model key, temperature, samples) — mirrors
# `ls /root/reference/uncertainty/`.
CONFIGS = [
    ("EX_T1.0_N3", "EX", 1.0, 3),
    ("EX_T1.0_N5", "EX", 1.0, 5),
    ("EX_T1.0_N10", "EX", 1.0, 10),
    ("EX_T1.0_N15", "EX", 1.0, 15),
    ("EX_T2.0_N3", "EX", 2.0, 3),
    ("EX_T2.0_N5", "EX", 2.0, 5),
    ("EX_T1.0_N15_nolatent", "EXnolatent", 1.0, 15),
    ("EX_T2.0_N5_latent", "EXlatent", 2.0, 5),
    # the reference also commits 5-image runs under analysis/ (its
    # headline EX_T1.0_N10 = 0.708 lives there) and one calibration/
    # config (EX_T2.0_N5_NoLatent; grid_report.find_ref handles the
    # capitalization).  Remaining configs ordered cheap-first (EX rows at
    # the 0.5 analysis scale, then MA@1.0 by ascending N) so a bounded
    # window maximizes covered configs — the grid resumes where it left.
    ("EX_T2.0_N10", "EX", 2.0, 10),
    ("EX_T2.0_N5_nolatent", "EXnolatent", 2.0, 5),
    ("MA_T1.0_N3", "MA", 1.0, 3),
    ("MA_T1.0_N5", "MA", 1.0, 5),
    ("MA_T2.0_N3", "MA", 2.0, 3),
    ("MA_T1.0_N10", "MA", 1.0, 10),
    ("MA_T2.0_N10", "MA", 2.0, 10),
    ("MA_T1.0_N15", "MA", 1.0, 15),
    ("MA_T2.0_N15", "MA", 2.0, 15),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", action="append", required=True,
                   help="KEY=checkpoint@scale (KEY in EX/EXnolatent/"
                        "EXlatent/MA)")
    p.add_argument("--output-dir", default="results/r4_grid")
    p.add_argument("--data-dir", default=DATA_DIR)
    p.add_argument("--patch-size", type=int, default=512)
    p.add_argument("--split", default="test")
    args = p.parse_args()

    models = {}
    for spec in args.model:
        key, rest = spec.split("=", 1)
        ckpt, scale = rest.rsplit("@", 1)
        models[key] = (ckpt, float(scale))

    probe_tpu()

    from vaeunet_tpu.analysis.analyze import AnalyzeArgs, analyze_model
    from vaeunet_tpu.compat.loading import load_model_and_variables
    from vaeunet_tpu.data.dataset import IDRIDDataset

    out_root = Path(args.output_dir)
    model_cache, ds_cache = {}, {}

    def load(key):
        if key not in model_cache:
            model_cache[key] = load_model_and_variables(models[key][0])[:2]
        return model_cache[key]

    def dataset(lesion, scale):
        if (lesion, scale) not in ds_cache:
            ds_cache[(lesion, scale)] = IDRIDDataset(
                args.data_dir, split=args.split, scale=scale,
                patch_size=None, lesion_type=lesion, skip_border_check=True)
        return ds_cache[(lesion, scale)]

    for dirname, key, temp, n in CONFIGS:
        csv = out_root / dirname / "analysis_metrics.csv"
        if csv.exists() and csv.stat().st_size > 100:
            print(f"[{dirname}] already done", flush=True)
            continue
        if key not in models:
            print(f"[{dirname}] SKIPPED: no --model {key}= given", flush=True)
            continue
        lesion = dirname.split("_")[0]
        ckpt, scale = models[key]
        model, variables = load(key)
        ds = dataset(lesion, scale)
        # analyze_model names its subdir <LESION>_T{t}_N{n}; ablation
        # configs carry a suffix, and the plain name may ALSO be a config
        # of this grid — so suffixed configs run inside a private staging
        # root (renaming the plain dir in place would clobber/steal the
        # plain config's results).
        plain_name = f"{lesion}_T{temp}_N{n}"
        staged = dirname != plain_name
        run_root = out_root / f"_ab_{dirname}" if staged else out_root
        aargs = AnalyzeArgs(lesion_type=lesion, temperature=temp, samples=n,
                            patch_size=args.patch_size,
                            output_dir=str(run_root), global_plots=False)
        print(f"[{dirname}] running (model {key}@{scale}, T={temp}, N={n})",
              flush=True)
        df = analyze_model(model, variables, ds, aargs)
        if staged:
            (out_root / dirname).parent.mkdir(parents=True, exist_ok=True)
            (run_root / plain_name).rename(out_root / dirname)
            run_root.rmdir()
        print(f"[{dirname}] mean dice {df['dice'].mean():.4f} "
              f"errAUROC {df['error_auroc'].mean():.4f}", flush=True)

    print("grid complete", flush=True)


if __name__ == "__main__":
    main()
