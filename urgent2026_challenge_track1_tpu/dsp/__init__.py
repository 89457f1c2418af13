"""Pure-functional DSP core (fs-parameterized, jit/vmap-friendly, static shapes)."""
