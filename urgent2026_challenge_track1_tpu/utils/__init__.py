"""Utilities: checkpoint conversion, audio helpers, scp tooling."""


def capped_nj(nj: int) -> int:
    """Worker-pool size capped at the host CPU count — a spawn pool larger
    than the core count only adds IPC/startup overhead (this image has one
    CPU; CLAUDE.md 'avoid multiprocessing defaults')."""
    import os

    return min(nj, os.cpu_count() or 1)
