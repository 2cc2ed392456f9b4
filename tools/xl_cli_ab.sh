#!/bin/bash
# XL ceiling CLI A/B: preconditioned vs plain CG at M=1M x K=8 on one chip.
# Round-4 recorded the plain run (README "Scale ceiling"); round 5 lands the
# chunked block-Jacobi setup so the same configuration runs preconditioned.
set -u
cd /root/repo
R=.biobank/xl_R.npz
RF=.biobank/xl_0_r.npy,.biobank/xl_1_r.npy,.biobank/xl_2_r.npy,.biobank/xl_3_r.npy,.biobank/xl_4_r.npy,.biobank/xl_5_r.npy,.biobank/xl_6_r.npy,.biobank/xl_7_r.npy

run_xl () {  # $1 = tag, extra flags follow
  local tag=$1; shift
  echo "=== XL CLI run: $tag ($(date -u +%H:%M:%S)) ==="
  local t0=$SECONDS
  timeout 3000 python -m sgvamp_tpu.cli.main \
    --ld-files $R,$R,$R,$R,$R,$R,$R,$R \
    --r-files $RF \
    --true-signal-file .biobank/xl_bet.npy \
    --out-dir .biobank/outxl_$tag --out-name xl \
    --N 300000,300000,300000,300000,300000,300000,300000,300000 \
    --M 1048576 --K 8 --iterations 6 \
    --prior-probs 0.99,0.01 --prior-vars 0,6.6762e-05 \
    --operator sym --ld-dtype int8 --block-size 128 --bandwidth 256 \
    --cg-maxit 200 --cg-rtol 1e-5 \
    --lmmse-damp 1 --rho 0.5 --stop-on-divergence 1 \
    "$@" > /tmp/xl_cli_$tag.log 2>&1
  echo "exit=$? tag=$tag wall_s=$((SECONDS - t0))"
}

run_xl precond --cg-precond-block 64 --cg-precond-dtype bfloat16
run_xl plain
echo "=== done $(date -u +%H:%M:%S) ==="
