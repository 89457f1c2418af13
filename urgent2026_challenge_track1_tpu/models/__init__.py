"""Model zoo: BSRNN (discriminative) and BSRNN flow-matching (generative)."""

from urgent2026_challenge_track1_tpu.models.bsrnn import (  # noqa: F401
    BSRNNConfig,
    bsrnn_apply,
    bsrnn_se_apply,
    init_bsrnn,
)
from urgent2026_challenge_track1_tpu.models.streaming_causal import (  # noqa: F401
    StreamingSession,
)
