"""Validation-data prep assets and scp assembly (VERDICT r2 item 8).

The reference ships the 2,200-utterance validation id list in-repo
(/root/reference/meta/validation_selected) and filters the urgent2025 scp
pools with it (utils/prepare_validation_data.sh:17-23). This repo vendors
the same data asset; these tests cover (a) the asset itself and (b) a
dry-run of the filter/scp-assembly path the prep script performs.
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent
META = REPO / "meta" / "validation_selected"


def test_validation_selected_vendored():
    assert META.is_file(), "meta/validation_selected must ship in-repo"
    ids = [ln.strip() for ln in META.read_text().splitlines() if ln.strip()]
    assert len(ids) == 2200
    # one id per line, no scp payload columns
    assert all(len(ln.split()) == 1 for ln in ids)
    assert len(set(ids)) == 2200, "ids must be unique"


def _filter(id_list: Path, text: str) -> str:
    r = subprocess.run(
        [sys.executable, str(REPO / "utils" / "filter_scp.py"), str(id_list)],
        input=text, capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    return r.stdout


def test_prep_scp_assembly_dry_run(tmp_path):
    """Reproduce prepare_validation_data.sh's filter step on a synthetic
    all_scp pool: only the selected uids survive, order preserved."""
    ids = [ln.strip() for ln in META.read_text().splitlines() if ln.strip()]
    picked = [ids[0], ids[7], ids[2199]]
    all_scp = "".join(
        f"{u} 16000 /corpus/{u}.flac\n" for u in picked + ["not_selected_uid"]
    )
    out = _filter(META, all_scp)
    got = [ln.split()[0] for ln in out.splitlines()]
    assert got == picked

    # text / utt2spk flavors use the same path (field 1 match)
    all_text = f"{picked[1]} hello world\nnot_selected_uid bye\n"
    assert _filter(META, all_text) == f"{picked[1]} hello world\n"
