"""End-to-end constraint-suggestion CLI (jobs/validate.py --suggest /
--run-contract): suggest on a clean baseline window, persist the contract
JSON, enforce it over the dirty table, and the injected defects must fail
the run."""

import json
import sys


def test_suggest_then_enforce_contract(fixture_dir, tmp_path, monkeypatch, capsys):
    import jobs.validate as V

    contract = str(tmp_path / "contract.json")
    # parts 0,1,4,6,7: the pre-drift window minus the partitions carrying
    # injected nulls/dupes/bad-codecs (2,3,5) — a curated clean baseline.
    # (192 kHz sr outliers have no per-part guarantee; if one lands in the
    # window it just widens the suggested range — the null/codec checks
    # below are injection-guaranteed either way.)
    monkeypatch.setattr(sys, "argv", [
        "validate.py", "--data", fixture_dir, "--suggest",
        "--baseline-parts", "0,1,4,6,7", "--contract", contract])
    assert V.main() == 0
    rows = json.load(open(contract))
    names = {(r["column"], r["constraint"]) for r in rows}
    assert ("transcript", "not_null") in names
    assert ("codec", "isin") in names
    assert ("sr_hz", "range") in names
    assert ("dur_ms", "range") in names
    # the clean window has no duplicate ids -> clip_id suggested unique
    assert ("clip_id", "unique") in names
    codec_domain = next(r["params"] for r in rows
                        if (r["column"], r["constraint"]) == ("codec", "isin"))
    assert "opus" not in codec_domain

    # enforcing the clean-window contract on the FULL dirty table fails:
    # injected transcript nulls (p2/p10), duplicate ids (p3/p9) and opus
    # codecs (p5/p11) each breach their suggested constraint
    monkeypatch.setattr(sys, "argv", [
        "validate.py", "--data", fixture_dir,
        "--run-contract", contract])
    assert V.main() == 1
    out = capsys.readouterr().out
    assert "not_null(transcript)" in out and "FAIL" in out
    assert "unique(clip_id)" in out
    assert "isin(codec)" in out

    # dur_ms drift (mean 400 -> 700 on parts >= 8) must NOT flip the
    # range check into a false alarm unless the drifted values actually
    # escape the observed envelope — range is a bounds check, not drift;
    # the drift suite owns distribution shift. Just assert the contract
    # run emitted one verdict row per (part, constraint-derived check).
    n_checks = len({ln.split()[1] for ln in out.splitlines()
                    if ln.startswith("part=")})
    assert n_checks >= 6


def test_run_contract_clean_table_passes(fixture_dir, tmp_path, monkeypatch):
    import jobs.validate as V

    # a permissive hand-written contract passes the dirty table: contract
    # enforcement is exactly as strict as its constraints
    contract = str(tmp_path / "loose.json")
    json.dump([{"column": "clip_id", "constraint": "not_null",
                "params": ""},
               {"column": "dur_ms", "constraint": "range",
                "params": "[0,100000]"}], open(contract, "w"))
    monkeypatch.setattr(sys, "argv", [
        "validate.py", "--data", fixture_dir,
        "--run-contract", contract])
    assert V.main() == 0


def test_suggest_diff_contract_flags_drift(fixture_dir, tmp_path,
                                           monkeypatch, capsys):
    """Pin the clean-window contract, re-suggest over the FULL dirty
    table: injected defects loosen not_null/isin/range -> exit 1 with
    DRIFT rows; diffing the clean window against itself exits 0."""
    import jobs.validate as V

    pinned = str(tmp_path / "pinned.json")
    monkeypatch.setattr(sys, "argv", [
        "validate.py", "--data", fixture_dir, "--suggest",
        "--baseline-parts", "0,1,4,6,7", "--contract", pinned])
    assert V.main() == 0
    capsys.readouterr()

    # same window vs its own pin: no drift
    monkeypatch.setattr(sys, "argv", [
        "validate.py", "--data", fixture_dir, "--suggest",
        "--baseline-parts", "0,1,4,6,7", "--diff-contract", pinned])
    assert V.main() == 0
    assert "0 loosened" in capsys.readouterr().out

    # full dirty table vs the pin: loosened constraints flag
    monkeypatch.setattr(sys, "argv", [
        "validate.py", "--data", fixture_dir, "--suggest",
        "--diff-contract", pinned])
    assert V.main() == 1
    out = capsys.readouterr().out
    assert "DRIFT" in out
    # transcript nulls drop the pinned not_null
    assert "not_null" in out and "removed" in out
    # opus rows grow the pinned codec domain
    assert "domain_grew" in out


def test_run_contract_malformed_json_fails_loud(fixture_dir, tmp_path,
                                                monkeypatch, capsys):
    import pytest

    import jobs.validate as V

    bad = str(tmp_path / "bad.json")
    json.dump([{"column": "sr_hz", "constraint": "regex_match",
                "params": ".*"}], open(bad, "w"))
    monkeypatch.setattr(sys, "argv", [
        "validate.py", "--data", fixture_dir, "--run-contract", bad])
    with pytest.raises(ValueError, match="unknown constraint"):
        V.main()
