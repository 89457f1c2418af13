#!/bin/env python
"""Corpus-prefix -> ISO-639-2 language map (reference utils/get_utt2lang.py)."""

import argparse

language_map = {
    "mls_french": "fra",
    "mls_german": "deu",
    "mls_spanish": "spa",
    "common_voice_fr": "fra",
    "common_voice_de": "deu",
    "common_voice_es": "spa",
    "common_voice_zh-CN": "zho",
}


def determine_language(speech_uid):
    for key, lang_id in language_map.items():
        if key in speech_uid:
            return lang_id
    return "eng"


def main(args):
    with open(args.meta_tsv) as tsvfile, open(args.outfile, "w") as scpfile:
        headers = next(tsvfile).strip().split("\t")
        uid_idx = headers.index("id")
        speech_uid_idx = headers.index("speech_uid")
        for line in tsvfile:
            tup = line.strip().split("\t")
            scpfile.write(f"{tup[uid_idx]} {determine_language(tup[speech_uid_idx])}\n")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--meta_tsv", type=str, required=True)
    parser.add_argument("--outfile", type=str, required=True)
    main(parser.parse_args())
