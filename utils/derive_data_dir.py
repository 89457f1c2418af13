#!/bin/env python
"""Derive a Kaldi-style data directory from a simulation meta.tsv.

Replaces the repeated awk blocks of the reference prepare scripts
(``utils/prepare_train_data.sh:115-124``): emits wav.scp (noisy), spk1.scp
(clean), utt2spk, spk2utt, text, utt2fs, utt2category, utt2lang and
speech_length.scp into the output directory.
"""

import argparse
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from urgent2026_challenge_track1_tpu.utils import audio_io  # noqa: E402
from get_utt2lang import determine_language  # noqa: E402


def main(args):
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    rows = []
    with open(args.meta_tsv) as f:
        headers = next(f).strip().split("\t")
        for line in f:
            rows.append(dict(zip(headers, line.strip().split("\t"))))
    rows.sort(key=lambda r: r["id"])

    def write(name, key_fn):
        with open(out / name, "w") as f:
            for r in rows:
                f.write(f"{r['id']} {key_fn(r)}\n")

    write("wav.scp", lambda r: r["noisy_path"])
    write("spk1.scp", lambda r: r["clean_path"])
    write("utt2spk", lambda r: r["speech_sid"])
    write("text", lambda r: r["text"])
    write("utt2fs", lambda r: r["fs"])
    write("utt2category", lambda r: f"1ch_{r['fs']}Hz")
    write("utt2lang", lambda r: determine_language(r["speech_uid"]))

    spk2utt = defaultdict(list)
    for r in rows:
        spk2utt[r["speech_sid"]].append(r["id"])
    with open(out / "spk2utt", "w") as f:
        for spk in sorted(spk2utt):
            f.write(f"{spk} {' '.join(spk2utt[spk])}\n")

    with open(out / "speech_length.scp", "w") as f:
        for r in rows:
            f.write(f"{r['id']} {audio_io.info_frames(r['noisy_path'])}\n")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--meta_tsv", type=str, required=True)
    parser.add_argument("--output_dir", type=str, required=True)
    main(parser.parse_args())
