#!/usr/bin/env bash
# hero_tpu container launcher — same CLI shape as the reference's
# launch_container.sh (TXT_DB VID_DIR OUTPUT PRETRAIN_DIR [--prepro]),
# with the GPU plumbing replaced by TPU-VM plumbing: --privileged +
# host networking exposes the TPU chips to the container, and JAX
# auto-detects them (no CUDA_VISIBLE_DEVICES analog is needed — use
# TPU_VISIBLE_CHIPS to restrict chips on a multi-chip host).
set -euo pipefail

TXT_DB=$1
VID_DIR=$2
OUTPUT=$3
PRETRAIN_DIR=$4

RO=",readonly"
if [ "${5:-}" = "--prepro" ]; then
    RO=""
fi

docker run --privileged --ipc=host --network=host --rm -it \
    --mount "src=$(pwd),dst=/src,type=bind" \
    --mount "src=$OUTPUT,dst=/storage,type=bind" \
    --mount "src=$PRETRAIN_DIR,dst=/pretrain,type=bind,readonly" \
    --mount "src=$TXT_DB,dst=/txt,type=bind$RO" \
    --mount "src=$VID_DIR,dst=/video,type=bind,readonly" \
    ${TPU_VISIBLE_CHIPS:+-e TPU_VISIBLE_CHIPS=$TPU_VISIBLE_CHIPS} \
    -w /src hero-tpu
