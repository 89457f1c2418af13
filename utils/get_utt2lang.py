#!/bin/env python
"""Derive utt2lang from a simulation meta.tsv via corpus-name prefixes.

Maps each record's source-utterance id to an ISO 639-2 language code based
on which multilingual corpus it came from; everything else is English.
"""

import argparse
import csv

LANGUAGE_PREFIXES = (
    ("mls_french", "fra"),
    ("mls_german", "deu"),
    ("mls_spanish", "spa"),
    ("common_voice_fr", "fra"),
    ("common_voice_de", "deu"),
    ("common_voice_es", "spa"),
    ("common_voice_zh-CN", "zho"),
)

# dict view used by other tools (utils/derive_data_dir.py)
language_map = dict(LANGUAGE_PREFIXES)


def determine_language(speech_uid: str) -> str:
    for prefix, lang in LANGUAGE_PREFIXES:
        if prefix in speech_uid:
            return lang
    return "eng"


def main(args):
    with open(args.meta_tsv, newline="") as tsv, open(args.outfile, "w") as out:
        reader = csv.DictReader(tsv, delimiter="\t")
        for row in reader:
            out.write(f"{row['id']} {determine_language(row['speech_uid'])}\n")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--meta_tsv", required=True,
                        help="simulation meta.tsv (needs id + speech_uid columns)")
    parser.add_argument("--outfile", required=True)
    main(parser.parse_args())
