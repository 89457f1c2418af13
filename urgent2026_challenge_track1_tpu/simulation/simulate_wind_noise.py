"""Wind-noise corpus builder (reference ``simulation/simulate_wind_noise.py``).

Config-driven batch generation per sampling rate with fixed per-fs seeds
(conf/wind_noise_simulation_*.yaml), writing ``wind_noise.scp``.

Run:  python -m urgent2026_challenge_track1_tpu.simulation.simulate_wind_noise \
        --output_dir data/wind_noise --config conf/wind_noise_simulation_train.yaml
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np
import yaml

from urgent2026_challenge_track1_tpu.simulation.wind import WindNoiseGenerator
from urgent2026_challenge_track1_tpu.utils import audio_io


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_dir", type=Path, required=True)
    parser.add_argument("--config", type=Path, required=True)
    args = parser.parse_args(argv)

    with open(args.config, "r") as yml:
        config = yaml.safe_load(yml)
    print(config)

    if os.path.exists(args.output_dir):
        raise RuntimeError(
            f"{args.output_dir} already exists. Please delete it to run again."
        )
    args.output_dir.mkdir(parents=True)

    try:
        from tqdm import tqdm
    except ImportError:  # pragma: no cover
        tqdm = lambda x: x

    with open(args.output_dir / "wind_noise.scp", "w") as scp:
        for seed, sample_rate in zip(config["seeds"], config["sample_rates"]):
            output_dir = args.output_dir / f"wind_noise_{sample_rate}hz"
            output_dir.mkdir(parents=True)
            for i in tqdm(range(config["num_data"])):
                gustiness = np.random.uniform(*config["gustiness_range"])
                wn = WindNoiseGenerator(
                    fs=sample_rate,
                    duration=config["duration"],
                    generate=True,
                    gustiness=gustiness,
                    start_seed=seed + i,
                )
                wn_signal, _ = wn.generate_wind_noise()
                output_path = output_dir / f"wind_noise_{i}.wav"
                audio_io.write(str(output_path), wn_signal, sample_rate)
                scp.write(
                    f"wind_noise_{sample_rate}hz_{i} {sample_rate} "
                    f"{output_path.resolve()}\n"
                )


if __name__ == "__main__":
    main()
