"""CLI contract tests (app.go:13-31): exit codes and flag surface."""

from __future__ import annotations

import subprocess
import sys

from tigerbeetle_cdc_nats_spark.cli import run_cli


def test_help_exits_zero(capsys):
    assert run_cli(["--help"]) == 0


def test_missing_cluster_id_exits_two(capsys):
    assert run_cli([]) == 2
    assert "--cluster-id is required" in capsys.readouterr().err


def test_invalid_config_exits_two(capsys):
    assert run_cli(["--cluster-id", "1", "--lock-refresh", "30",
                    "--lock-ttl", "30"]) == 2
    assert "--lock-refresh must be less than --lock-ttl" in capsys.readouterr().err


def test_config_only_prints_resolved_names(capsys):
    assert run_cli(["--cluster-id", "7"]) == 0
    out = capsys.readouterr().out
    assert "stream=TB_CDC_EVENTS_7" in out
    assert "progress=TB_CDC_PROGRESS_7" in out


def test_cluster_alias_flag(capsys):
    # --cluster is an alias for --cluster-id (config.go:180-181).
    assert run_cli(["--cluster", "9"]) == 0
    assert "TB_CDC_EVENTS_9" in capsys.readouterr().out


def test_module_invocation():
    # python -m tigerbeetle_cdc_nats_spark (cmd/tb-cdc-nats/main.go analogue).
    proc = subprocess.run(
        [sys.executable, "-m", "tigerbeetle_cdc_nats_spark",
         "--cluster-id", "3"],
        capture_output=True, text=True, cwd="/root/repo", timeout=60,
    )
    assert proc.returncode == 0
    assert "TB_CDC_EVENTS_3" in proc.stdout


def test_version_flag_exits_zero(capsys):
    assert run_cli(["--version"]) == 0
    assert "0.1.0" in capsys.readouterr().out
