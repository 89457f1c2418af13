"""Kaldi-style scp readers (reference ``dataset.py:79-101`` semantics)."""

from __future__ import annotations

from collections import defaultdict

__all__ = ["read_kv_scp", "read_source_scp"]


def read_kv_scp(scp: str) -> dict[str, str]:
    """``uid value`` lines -> dict; duplicate uids are an error."""
    rtv = {}
    with open(scp, "r", encoding="utf-8") as f:
        for line in f:
            uid, value = line.strip().split()
            assert uid not in rtv, uid
            rtv[uid] = value
    return rtv


def read_source_scp(scp: str):
    """``uid fs path`` lines -> (fs-keyed dict, fs-keyed uid lists, flat dict)."""
    source_dict = defaultdict(dict)
    flat = {}
    with open(scp, "r", encoding="utf-8") as f:
        for line in f:
            uid, fs, path = line.strip().split()
            fs = int(fs)
            assert uid not in source_dict[fs], (uid, fs)
            source_dict[fs][uid] = path
            flat[uid] = path
    uids = {k: list(source_dict[k].keys()) for k in source_dict}
    return dict(source_dict), uids, flat
