"""Golden-fixture pinning (VERDICT r3 missing #3): a tampered or unlisted
golden must fail sha256 verification loudly and trigger regeneration."""
import json
import os

import numpy as np
import pytest

import golden_utils


@pytest.fixture
def fake_goldens(tmp_path, monkeypatch):
    gdir = tmp_path / "goldens"
    gdir.mkdir()
    np.savez(gdir / "rrtmil_c16r50_l937.npz", x=np.arange(4.0))
    np.savez(gdir / "other.npz", y=np.ones(3))
    monkeypatch.setattr(golden_utils, "GOLDEN_DIR", str(gdir))
    monkeypatch.setattr(golden_utils, "MANIFEST",
                        str(gdir / "MANIFEST.json"))
    monkeypatch.setattr(golden_utils, "_verified", False)
    golden_utils.write_manifest()
    return gdir


def test_clean_set_verifies(fake_goldens):
    assert golden_utils.ensure_goldens()
    assert golden_utils._verified


def test_tampered_golden_detected_and_regenerated(fake_goldens, monkeypatch):
    np.savez(fake_goldens / "other.npz", y=np.zeros(3))  # tamper
    calls = {"n": 0}

    def fake_regen():
        calls["n"] += 1
        np.savez(fake_goldens / "other.npz", y=np.ones(3))  # restore

    monkeypatch.setattr(golden_utils, "_regenerate", fake_regen)
    monkeypatch.setattr(golden_utils, "_REFERENCE",
                        str(fake_goldens))  # any existing dir
    monkeypatch.setattr(golden_utils, "_verified", False)
    assert golden_utils.ensure_goldens()
    assert calls["n"] == 1


def test_tampered_golden_without_reference_raises(fake_goldens, monkeypatch):
    np.savez(fake_goldens / "other.npz", y=np.zeros(3))
    monkeypatch.setattr(golden_utils, "_REFERENCE",
                        str(fake_goldens / "no_such_dir"))
    monkeypatch.setattr(golden_utils, "_verified", False)
    with pytest.raises(RuntimeError, match="sha256"):
        golden_utils.ensure_goldens()


def test_unlisted_file_detected(fake_goldens, monkeypatch):
    np.savez(fake_goldens / "smuggled.npz", z=np.ones(2))
    monkeypatch.setattr(golden_utils, "_verified", False)
    assert "smuggled.npz" in golden_utils._manifest_mismatches()


def test_verification_runs_once_per_process(fake_goldens, monkeypatch):
    calls = {"n": 0}
    real = golden_utils._manifest_mismatches

    def counting():
        calls["n"] += 1
        return real()

    monkeypatch.setattr(golden_utils, "_manifest_mismatches", counting)
    golden_utils.ensure_goldens()
    golden_utils.ensure_goldens()
    assert calls["n"] == 1


def test_regen_drift_is_surfaced(fake_goldens, monkeypatch, capsys):
    """If regeneration produces DIFFERENT content than the old pins (the
    oracle itself changed), the adoption must be loud, not silent."""
    np.savez(fake_goldens / "other.npz", y=np.zeros(3))  # tamper

    def fake_regen():
        np.savez(fake_goldens / "other.npz", y=np.full(3, 7.0))  # drifted
        golden_utils.write_manifest()        # the real generator re-pins

    monkeypatch.setattr(golden_utils, "_regenerate", fake_regen)
    monkeypatch.setattr(golden_utils, "_REFERENCE", str(fake_goldens))
    monkeypatch.setattr(golden_utils, "_verified", False)
    assert golden_utils.ensure_goldens()
    err = capsys.readouterr().err
    assert "REGENERATED CONTENT DIFFERS" in err
    assert "other.npz" in err


def test_regen_missing_file_raises(fake_goldens, monkeypatch):
    (fake_goldens / "other.npz").unlink()

    def fake_regen():
        golden_utils.write_manifest()

    monkeypatch.setattr(golden_utils, "_regenerate", fake_regen)
    monkeypatch.setattr(golden_utils, "_REFERENCE", str(fake_goldens))
    monkeypatch.setattr(golden_utils, "_verified", False)
    with pytest.raises(RuntimeError, match="missing after regeneration"):
        golden_utils.ensure_goldens()
