"""scripts/watchdog.sh: the campaign stall watchdog kills a silent process
(rc 99) and passes a healthy one through untouched."""

import os.path as osp
import subprocess

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
WD = osp.join(REPO, "scripts", "watchdog.sh")


def _run(tmp_path, stall_s, poll_s, cmd):
    log = tmp_path / "stage.log"
    script = (
        f". {WD}\n"
        f"CAMPAIGN_STALL_S={stall_s} CAMPAIGN_WATCHDOG_POLL_S={poll_s} "
        f"_run_with_watchdog {log} {cmd}\n"
        'echo "rc=$?"\n'
    )
    out = subprocess.run(
        ["bash", "-c", script], capture_output=True, text=True, timeout=120,
    )
    return out, log


def test_watchdog_kills_stalled_process(tmp_path):
    # writes once, then goes silent forever -> watchdog must fire with 99
    out, log = _run(
        tmp_path, stall_s=2, poll_s=1, cmd="bash -c 'echo started; sleep 600'"
    )
    assert "rc=99" in out.stdout, out.stdout + out.stderr
    assert "WATCHDOG" in out.stdout
    assert "started" in log.read_text()


def test_watchdog_passes_healthy_process_through(tmp_path):
    # keeps logging past the stall budget -> exits normally with its own rc
    out, log = _run(
        tmp_path, stall_s=3, poll_s=1,
        cmd="bash -c 'for i in 1 2 3 4 5; do echo tick$i; sleep 1; done; exit 7'",
    )
    assert "rc=7" in out.stdout, out.stdout + out.stderr
    assert "WATCHDOG" not in out.stdout
    assert "tick5" in log.read_text()
