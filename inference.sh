#!/bin/bash
# Run enhancement over a validation scp with a chosen checkpoint
# (reference inference.sh surface; the reference file additionally records
# the authors' experiment checkpoints and their validation SI-SNR —
# see BASELINE.md for those numbers).
set -eu -o pipefail

ckpt=${1:-exp/BSRNN_baseline/baseline/version_0/checkpoints}
input_scp=${2:-data/validation/wav.scp}
output_dir=${3:-enhanced/$(basename ${ckpt%.ckpt})}

python inference.py \
    --input_scp "${input_scp}" \
    --ckpt_path "${ckpt}" \
    --output_dir "${output_dir}"
