"""Offline simulation phase 2: render meta.tsv -> paired clean/noisy corpora.

CLI-compatible with the reference ``simulation/simulate_data_from_param.py``
(:373-438 main, :592-622 flags): reads the meta.tsv produced by phase 1,
renders each row with a multiprocessing pool (reference uses tqdm process_map),
seeded per file id for reproducibility.

Run:  python -m urgent2026_challenge_track1_tpu.simulation.simulate_data_from_param \
        --config conf/simulation_train.yaml --meta_tsv ... [same flags as phase 1]
"""

from __future__ import annotations

import multiprocessing as mp
from functools import partial
from pathlib import Path

from urgent2026_challenge_track1_tpu.simulation.generate_data_param import (
    _str2bool,
    get_parser,
)
from urgent2026_challenge_track1_tpu.simulation.render import (  # noqa: F401
    process_one_sample,
    render_one,
)

__all__ = ["main"]


def _read_flat_scp(scps):
    dic = {}
    for scp in scps:
        with open(scp, "r") as f:
            for line in f:
                uid, fs, audio_path = line.strip().split()
                assert uid not in dic, (uid, fs)
                dic[uid] = audio_path
    return dic


def main(args):
    speech_dic = _read_flat_scp(args.speech_scps)
    noise_dic = _read_flat_scp(args.noise_scps)
    noise_dic.update(_read_flat_scp(args.wind_noise_scps or []))
    rir_dic = _read_flat_scp(args.rir_scps) if args.rir_scps is not None else None

    # The reference reads log_dir/meta.tsv and leaves --meta_tsv decorative
    # (simulate_data_from_param.py:413,596) — same precedence here, but
    # --meta_tsv alone also works instead of crashing on log_dir=None.
    meta_path = (
        Path(args.log_dir) / "meta.tsv" if args.log_dir is not None else Path(args.meta_tsv)
    )
    meta = []
    with open(meta_path, "r") as f:
        headers = next(f).strip().split("\t")
        for line in f:
            meta.append(dict(zip(headers, line.strip().split("\t"))))

    worker = partial(
        render_one,
        store_noise=args.store_noise,
        speech_dic=speech_dic,
        noise_dic=noise_dic,
        rir_dic=rir_dic,
        highpass=args.highpass,
    )
    from urgent2026_challenge_track1_tpu.utils import capped_nj

    nj = capped_nj(args.nj)
    if nj <= 1:
        try:
            from tqdm import tqdm
        except ImportError:  # pragma: no cover
            tqdm = lambda x: x
        for m in tqdm(meta):
            worker(m)
    else:
        with mp.get_context("spawn").Pool(nj) as pool:
            for i, _ in enumerate(pool.imap_unordered(worker, meta, chunksize=args.chunksize)):
                if i % 500 == 0:
                    print(f"rendered {i}/{len(meta)}", flush=True)


if __name__ == "__main__":
    parser = get_parser()
    g = parser.add_argument_group(description="New arguments")
    g.add_argument("--meta_tsv", type=str, default=None,
                   help="kept for reference parity; meta.tsv is read from --log_dir")
    g.add_argument("--nj", type=int, default=8)
    g.add_argument("--chunksize", type=int, default=1000)
    # the reference uses type=bool here (:614), under which '--highpass
    # False' silently enables the filter; _str2bool keeps the documented
    # usage ('--highpass True', prepare_train_data.sh:109) identical while
    # making False actually mean False
    g.add_argument("--highpass", type=_str2bool, default=False)
    args = parser.parse_args()
    print(args)
    main(args)
