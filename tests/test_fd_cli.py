"""FD-audit and Benford-screen CLI modes (jobs/validate.py --fd /
--benford): the injected duplicate-id rows must surface as functional-
dependency violations, and the lognormal dur_ms must read as
non-Benford (screen output, exit 0)."""

import sys


def test_fd_cli_finds_injected_label_conflicts(fixture_dir, monkeypatch,
                                               capsys):
    import jobs.validate as V

    monkeypatch.setattr(sys, "argv", [
        "validate.py", "--data", fixture_dir,
        "--fd", "part,clip_id:transcript"])
    assert V.main() == 1                      # violations exist -> gate
    out = capsys.readouterr().out
    assert "violating key(s)" in out
    assert "distinct transcript" in out

    # an FD that holds exits clean: rid is the table's true key
    monkeypatch.setattr(sys, "argv", [
        "validate.py", "--data", fixture_dir, "--fd", "rid:transcript"])
    assert V.main() == 0

    # bad column is a usage error
    monkeypatch.setattr(sys, "argv", [
        "validate.py", "--data", fixture_dir, "--fd", "part:nope"])
    assert V.main() == 2


def test_benford_cli_screens_all_parts(fixture_dir, monkeypatch, capsys):
    import jobs.validate as V

    monkeypatch.setattr(sys, "argv", [
        "validate.py", "--data", fixture_dir, "--benford", "dur_ms"])
    assert V.main() == 0                      # screen, never a gate
    out = capsys.readouterr().out
    # lognormal(sigma=0.4) spans < 2 decades: decidedly non-Benford on
    # every partition at n=200
    assert "16/16 partitions suspect" in out


def test_fd_benford_exclusive_with_quarantine(fixture_dir, monkeypatch,
                                              capsys, tmp_path):
    """--fd/--benford are exclusive screen modes: combining either with
    --quarantine is a usage error (the screen block would otherwise
    return before the quarantine path, silently skipping it)."""
    import jobs.validate as V

    monkeypatch.setattr(sys, "argv", [
        "validate.py", "--data", fixture_dir,
        "--fd", "part,clip_id:transcript",
        "--quarantine", str(tmp_path / "q")])
    assert V.main() == 2
    assert "exclusive screen modes" in capsys.readouterr().err

    monkeypatch.setattr(sys, "argv", [
        "validate.py", "--data", fixture_dir, "--benford", "dur_ms",
        "--quarantine", str(tmp_path / "q2")])
    assert V.main() == 2
