#!/bin/bash
# Run the full evaluation suite over an enhanced/inference scp
# (reference eval_all.sh surface; all CLIs accept --nsplits/--job for
# multi-node sharding).
#
# Unlike the reference (which assumes every model backend is installed and
# dies at the first missing one), this orchestrator degrades gracefully:
# a CLI exiting with code 86 (= _shared.EXIT_BACKEND_UNAVAILABLE, meaning
# "pretrained-model backend not available in this environment") is recorded
# as SKIPPED and the suite continues; any other failure still aborts.

set -e
set -u
set -o pipefail

# defaults match the reference; each is overridable via environment
inf_scp=${inf_scp:-./enhanced/baseline/inf.scp}         # inference scp
ref_scp=${ref_scp:-./data/validation_leaderboard/spk1.scp}  # reference scp
output_dir=${output_dir:-./enhanced/baseline}           # output path
utt2lang=${utt2lang:-./data/validation_leaderboard/utt2lang}
text=${text:-./data/validation_leaderboard/text}
meta_tsv=${meta_tsv:-}                      # optional: meta.tsv for get_breakdown
nj=${nj:-8}
device=${device:-cpu}  # jax picks TPU for the SE model; eval models run on cpu here

# Offline model routes (see docs/MIGRATION.md): when set, each points at a
# local export passed as --model_path so the metric runs without egress.
# e.g. UTMOS_MODEL=/models/utmos22.pt NISQA_MODEL=/models/nisqa.pt ...
utmos_model_args=${UTMOS_MODEL:+--model_path ${UTMOS_MODEL}}
nisqa_model_args=${NISQA_MODEL:+--model_path ${NISQA_MODEL}}
scoreq_model_args=${SCOREQ_MODEL:+--model_path ${SCOREQ_MODEL}}
speechbert_model_args=${SPEECHBERT_MODEL:+--model_path ${SPEECHBERT_MODEL}}
lps_model_args=${LPS_MODEL:+--model_path ${LPS_MODEL}}
spk_model_args=${SPK_MODEL:+--model_path ${SPK_MODEL}}
emo_model_args=${EMO_MODEL:+--model_path ${EMO_MODEL}}
wer_model_args=${WER_MODEL:+--model_path ${WER_MODEL}}
lid_model_args=${LID_MODEL:+--model_path ${LID_MODEL}}

mkdir -p ${output_dir}

produced=()
skipped=()

run_metric () {
    local name="$1"; shift
    echo "=== ${name} ==="
    local rc=0
    "$@" || rc=$?
    if [ "${rc}" -eq 0 ]; then
        produced+=("${name}")
    elif [ "${rc}" -eq 86 ]; then
        skipped+=("${name}")
    else
        echo "FAILED: ${name} (exit ${rc})" >&2
        exit "${rc}"
    fi
}

# Intrusive SE metrics (native DSP: PESQ/ESTOI)
run_metric intrusive_se python evaluation_metrics/calculate_intrusive_se_metrics.py --ref_scp ${ref_scp} --inf_scp ${inf_scp} --output_dir ${output_dir}/score/se --nj ${nj}

# Non-intrusive SE metrics
run_metric dnsmos python evaluation_metrics/calculate_nonintrusive_dnsmos.py --inf_scp ${inf_scp} --output_dir ${output_dir}/score/dnsmos --device ${device} ${dnsmos_args:-}
run_metric nisqa python evaluation_metrics/calculate_nonintrusive_nisqa.py --inf_scp ${inf_scp} --output_dir ${output_dir}/score/nisqa --device ${device} ${nisqa_model_args:-}
run_metric utmos python evaluation_metrics/calculate_nonintrusive_utmos.py --inf_scp ${inf_scp} --output_dir ${output_dir}/score/utmos --device ${device} ${utmos_model_args:-}
run_metric scoreq python evaluation_metrics/calculate_nonintrusive_scoreq.py --inf_scp ${inf_scp} --output_dir ${output_dir}/score/scoreq ${scoreq_model_args:-}

# Downstream-task-independent metrics
run_metric speechbert_score python evaluation_metrics/calculate_speechbert_score.py --ref_scp ${ref_scp} --inf_scp ${inf_scp} --output_dir ${output_dir}/score/speechbert_score --device ${device} ${speechbert_model_args:-}
run_metric phoneme_similarity python evaluation_metrics/calculate_phoneme_similarity.py --ref_scp ${ref_scp} --inf_scp ${inf_scp} --output_dir ${output_dir}/score/lps --device ${device} ${lps_model_args:-}

# Downstream-task-dependent metrics
run_metric speaker_similarity python evaluation_metrics/calculate_speaker_similarity.py --ref_scp ${ref_scp} --inf_scp ${inf_scp} --output_dir ${output_dir}/score/spk_sim --device ${device} ${spk_model_args:-}
run_metric emotion_similarity python evaluation_metrics/calculate_emotion_similarity.py --ref_scp ${ref_scp} --inf_scp ${inf_scp} --output_dir ${output_dir}/score/emo_sim --device ${device} ${emo_model_args:-}
run_metric lid_accuracy python evaluation_metrics/calculate_lid_accuracy.py --meta_tsv ${utt2lang} --inf_scp ${inf_scp} --output_dir ${output_dir}/score/lid_acc --device ${device} ${lid_model_args}
run_metric wer python evaluation_metrics/calculate_wer.py --meta_tsv ${text} --utt2lang ${utt2lang} --inf_scp ${inf_scp} --output_dir ${output_dir}/score/cer --device ${device} ${wer_model_args}

# Grouped breakdown over whatever was produced (needs the simulation
# meta.tsv).  One malformed scp must not abort the suite after every metric
# already ran — record the failure and still print the summary.
if [ -n "${meta_tsv}" ] && [ -f "${meta_tsv}" ]; then
    breakdown_ok=1
    for scp in $(find ${output_dir}/score -name '*.scp' | sort); do
        echo "=== breakdown: ${scp} ==="
        if ! python evaluation_metrics/get_breakdown.py "${scp}" --meta_tsv ${meta_tsv} \
            | tee "${scp%.scp}.breakdown.txt"; then
            echo "FAILED: breakdown for ${scp}" >&2
            breakdown_ok=0
        fi
    done
    if [ "${breakdown_ok}" -eq 1 ]; then
        produced+=("breakdown")
    else
        skipped+=("breakdown(failed)")
    fi
fi

echo
echo "================ eval_all summary ================"
echo "produced (${#produced[@]}): ${produced[*]:-}"
echo "skipped  (${#skipped[@]}): ${skipped[*]:-}"
echo "=================================================="
