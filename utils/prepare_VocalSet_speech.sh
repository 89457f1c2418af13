#!/bin/bash
# Prepare the VocalSet corpus: download, estimate effective bandwidth, and
# resample each file to the smallest standard rate covering it
# (reference utils/prepare_VocalSet*.sh flow, driven by this repo's tools).
set -eu -o pipefail

output_dir="downloads/VocalSet/"
mkdir -p "${output_dir}"

echo "=== Preparing VocalSet data ==="
if [ ! -e "${output_dir}/download_VocalSet.done" ]; then
    curl -L -o ${output_dir}/VocalSet.zip \
        https://zenodo.org/records/1193957/files/VocalSet.zip?download=1
    unzip ${output_dir}/VocalSet.zip -d ${output_dir}
    touch "${output_dir}/download_VocalSet.done"
fi

mkdir -p tmp
BW_EST_FILE=tmp/VocalSet.json
if [ ! -f ${BW_EST_FILE} ]; then
    echo "[VocalSet] estimating audio bandwidth"
    OMP_NUM_THREADS=1 python utils/estimate_audio_bandwidth.py \
        --audio_dir "${output_dir}/FULL/" \
        --audio_format wav --chunksize 1000 --nj 8 \
        --outfile "${BW_EST_FILE}"
fi

RESAMP_SCP_FILE="${output_dir}/VocalSet_resampled.scp"
if [ ! -f ${RESAMP_SCP_FILE} ]; then
    echo "[VocalSet] resampling to estimated audio bandwidth"
    OMP_NUM_THREADS=1 python utils/resample_to_estimated_bandwidth.py \
        --bandwidth_data "${BW_EST_FILE}" \
        --out_scpfile "${RESAMP_SCP_FILE}" \
        --outdir "${output_dir}/resampled/" \
        --nj 8 --chunksize 1000
fi
