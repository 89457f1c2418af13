"""Data pipeline: scp IO, datasets, bucketed multi-rate batching, loaders."""

from urgent2026_challenge_track1_tpu.data.scp import (  # noqa: F401
    read_kv_scp,
    read_source_scp,
)
from urgent2026_challenge_track1_tpu.data.dataset import (  # noqa: F401
    AudioDataModule,
    GroupedBatchSampler,
    PreSimulatedDataset,
    collate_fn,
)
