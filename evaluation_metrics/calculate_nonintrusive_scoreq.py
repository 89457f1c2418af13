#!/bin/env python
"""Non-intrusive SCOREQ MOS (reference calculate_nonintrusive_scoreq.py).

Uses the SCOREQ package (natural-speech no-reference mode); resamples to
16 kHz.
"""

import numpy as np

from _backends import BackendUnavailable
from _shared import audio_io, base_parser, read_pairs, shard, write_results, exit_backend_unavailable
from urgent2026_challenge_track1_tpu.simulation.dsp import resample

METRICS = ("SCOREQ",)


def main(args):
    try:
        import scoreq
    except ImportError as e:
        raise BackendUnavailable(
            "SCOREQ",
            "the scoreq package is not importable — clone "
            "https://github.com/alessandroragano/scoreq and install it.",
        ) from e
    pairs = read_pairs(args)
    pairs, suffix = shard(pairs, args)
    model = scoreq.Scoreq(data_domain="natural", mode="nr")
    ret = []
    for uid, path in pairs:
        score = model.predict(test_path=path, ref_path=None)
        ret.append((uid, {"SCOREQ": float(score)}))
    write_results(args.output_dir, METRICS, ret, suffix)


if __name__ == "__main__":
    try:
        main(base_parser().parse_args())
    except BackendUnavailable as e:
        exit_backend_unavailable(e)
