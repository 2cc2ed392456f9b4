"""Simulation CLI: generates test data with the reference generators'
behavior (reference simulation/*.py), as subcommands of one tool:

  sgvamp-sim gen-phen       ~ sim_gen_phen.py      (single cohort, saves R)
  sgvamp-sim gen-phen-mult  ~ sim_gen_phen_mult.py (K cohorts, shared beta)
  sgvamp-sim phen           ~ sim_phen.py          (real .bed genotypes)

Output file names match the reference scripts exactly.
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

import numpy as np

from sgvamp_tpu.data import simulate as sim


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Simulate data for sgVAMP")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, with_bed=False, with_K=False):
        if with_bed:
            sp.add_argument("-bed", "--bed", help="Path to bed file", required=True)
        sp.add_argument("-out", "--out", help="Output path", required=True)
        sp.add_argument("-N", "--N", help="Number of samples", required=not with_bed)
        sp.add_argument("-M", "--M", help="Number of markers", required=True)
        sp.add_argument("-h2", "--h2", help="Heritability", default=0.8)
        sp.add_argument("-lam", "--lam", help="Sparsity (lambda)", default=0.5)
        if with_K:
            sp.add_argument("-K", "--K", help="Number of cohorts", default=2)
        sp.add_argument("--seed", help="RNG seed", type=int, default=None)

    common(sub.add_parser("gen-phen", help="single-cohort synthetic genotypes"))
    common(sub.add_parser("gen-phen-mult", help="multi-cohort, shared signal"),
           with_K=True)
    common(sub.add_parser("phen", help="phenotype over real .bed genotypes"),
           with_bed=True)
    return p


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    rng = np.random.default_rng(args.seed)
    M = int(args.M)
    h2, lam = float(args.h2), float(args.lam)

    if args.cmd == "gen-phen":
        d = sim.simulate_single(int(args.N), M, h2, lam, rng)
        np.save(args.out + "_phen.npy", d.y)
        np.save(args.out + "_bet.npy", d.beta.reshape(M, 1))
        np.save(args.out + "_r.npy", d.r)
        np.save(args.out + "_R.npy", d.R)
        print(f"wrote {args.out}_{{phen,bet,r,R}}.npy  "
              f"(Var(g)={np.var(d.y - 0):.3f} target h2={h2})")
    elif args.cmd == "gen-phen-mult":
        ds = sim.simulate_multi(int(args.N), M, int(args.K), h2, lam, rng)
        np.save(args.out + "_bet.npy", ds[0].beta.reshape(M, 1))
        for i, d in enumerate(ds):
            np.save(f"{args.out}_{i}_phen.npy", d.y)
            np.save(f"{args.out}_{i}_r.npy", d.r)
            np.save(f"{args.out}_{i}_R.npy", d.R)
        print(f"wrote {args.out}_bet.npy and per-cohort files for K={args.K}")
    elif args.cmd == "phen":
        d = sim.simulate_from_bed(args.bed, M, h2, lam, rng)
        np.save(args.out + "_phen.npy", d.y)
        np.save(args.out + "_bet.npy", d.beta.reshape(M, 1))
        np.save(args.out + "_r.npy", d.r)
        print(f"wrote {args.out}_{{phen,bet,r}}.npy")
    return 0


if __name__ == "__main__":
    sys.exit(main())
