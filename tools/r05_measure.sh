#!/bin/bash
# Round-5 recorded measurements on the staged biobank inputs:
#  1. MLE vs EM prior learning at M=512k through the CLI (VERDICT item 4)
#  2. fused in-scan early stop wall-clock demo at M=512k (VERDICT item 5)
#  3. the XL (M=1M x K=8) preconditioned CLI rerun with the eig-cached
#     rebuild (follow-up to XL_CLI_r05.json's LU-rebuild record)
set -u
cd /root/repo

BB="--ld-files .biobank/bb_R.npz --r-files .biobank/bb_r.npy \
  --true-signal-file .biobank/bb_bet.npy \
  --N 300000 --M 524288 --iterations 10 \
  --prior-probs 0.99,0.01 --prior-vars 0,0.000133537 \
  --operator sym --ld-dtype int8 --block-size 128 --bandwidth 256 \
  --cg-maxit 500 --cg-rtol 1e-5 --lmmse-damp 1 --rho 0.5"

run () {  # $1 tag, rest flags
  local tag=$1; shift
  local t0=$SECONDS
  echo "=== $tag ($(date -u +%H:%M:%S)) ==="
  timeout 2400 python -m sgvamp_tpu.cli.main $BB \
    --out-dir .biobank/out_$tag --out-name bb "$@" \
    > /tmp/r05_$tag.log 2>&1
  echo "exit=$? wall_s=$((SECONDS - t0))"
  grep -E "inference running time|Early stop|Selected iterate \(gam1" /tmp/r05_$tag.log | head -4
}

# 1. prior-learning cost: EM vs MLE, host loop, divergence stop armed
run em_base  --stop-on-divergence 1 --prior-update em
run mle_base --stop-on-divergence 1 --prior-update mle

# 2. fused wall-clock: armed in-scan stop vs full fixed count
run fused_stop --fused 1 --stop-on-divergence 1
run fused_full --fused 1

echo "=== XL precond rerun (eig cache) ==="
R=.biobank/xl_R.npz
RF=.biobank/xl_0_r.npy,.biobank/xl_1_r.npy,.biobank/xl_2_r.npy,.biobank/xl_3_r.npy,.biobank/xl_4_r.npy,.biobank/xl_5_r.npy,.biobank/xl_6_r.npy,.biobank/xl_7_r.npy
t0=$SECONDS
timeout 3000 python -m sgvamp_tpu.cli.main \
  --ld-files $R,$R,$R,$R,$R,$R,$R,$R --r-files $RF \
  --true-signal-file .biobank/xl_bet.npy \
  --out-dir .biobank/outxl_eig --out-name xl \
  --N 300000,300000,300000,300000,300000,300000,300000,300000 \
  --M 1048576 --K 8 --iterations 6 \
  --prior-probs 0.99,0.01 --prior-vars 0,6.6762e-05 \
  --operator sym --ld-dtype int8 --block-size 128 --bandwidth 256 \
  --cg-maxit 200 --cg-rtol 1e-5 \
  --lmmse-damp 1 --rho 0.5 --stop-on-divergence 1 \
  --cg-precond-block 64 --cg-precond-dtype bfloat16 \
  > /tmp/r05_xl_eig.log 2>&1
echo "exit=$? wall_s=$((SECONDS - t0))"
grep -E "roofline|inference running time|Selected iterate \(gam1" /tmp/r05_xl_eig.log | head -10
echo "=== done $(date -u +%H:%M:%S) ==="
