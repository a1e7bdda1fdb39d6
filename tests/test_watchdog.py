"""Stall watchdog + auto-resume supervisor (elastic recovery).

The watchdog turns a hung remote-runtime RPC into the existing graceful
SIGTERM checkpoint+exit (train/watchdog.py); the supervisor relaunches
from the newest checkpoint (scripts/supervise_train.py). Measured
failure mode: docs/evidence/longrun30k.md.
"""

import os
import sys
import threading
import time

import numpy as np

from gan_sr_wind_field_tpu.train.watchdog import StallWatchdog

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from supervise_train import (  # noqa: E402
    find_latest_ckpt,
    supervise,
    write_resume_cfg,
)


def _spin_until(cond, timeout=5.0):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        if cond():
            return True
        time.sleep(0.02)
    return False


class TestStallWatchdog:
    def test_fires_after_threshold_once_armed(self):
        fired = []
        wd = StallWatchdog(0.2, action=lambda: fired.append(1),
                           hard_action=lambda: None, poll_s=0.05)
        wd.start()
        wd.beat()
        assert _spin_until(lambda: fired)
        wd.stop()

    def test_does_not_fire_before_first_beat(self):
        fired = []
        wd = StallWatchdog(0.1, action=lambda: fired.append(1),
                           hard_action=lambda: None, poll_s=0.02)
        wd.start()
        time.sleep(0.5)  # "compiling" — way past threshold, no beat yet
        assert not fired
        wd.stop()

    def test_beats_prevent_firing(self):
        fired = []
        wd = StallWatchdog(0.3, action=lambda: fired.append(1),
                           hard_action=lambda: None, poll_s=0.05)
        wd.start()
        for _ in range(10):
            wd.beat()
            time.sleep(0.05)
        assert not fired
        wd.stop()

    def test_escalates_to_hard_action_after_max_fires(self):
        fired, hard = [], threading.Event()
        wd = StallWatchdog(0.15, max_fires=2,
                           action=lambda: fired.append(1),
                           hard_action=hard.set, poll_s=0.03)
        wd.start()
        wd.beat()
        assert hard.wait(5.0)
        assert len(fired) == 2  # two graceful attempts, then hard exit
        wd.stop()

    def test_beat_resets_escalation(self):
        fired = []
        wd = StallWatchdog(0.15, max_fires=2,
                           action=lambda: fired.append(1),
                           hard_action=lambda: fired.append("hard"),
                           poll_s=0.03)
        wd.start()
        wd.beat()
        assert _spin_until(lambda: fired)  # first graceful fire
        wd.beat()  # progress resumed — escalation must reset
        time.sleep(0.1)
        assert "hard" not in fired
        wd.stop()

    def test_zero_threshold_is_disabled(self):
        wd = StallWatchdog(0).start()
        assert wd._thread is None
        wd.stop()

    def test_grace_defers_firing_through_long_nonbeating_phase(self):
        # measured failure: the 30k run's first val sweep (two remote
        # compiles) ran >352 s without a beat and drew a spurious SIGTERM
        # at threshold 300 — grace() must cover a known-long phase
        fired = []
        wd = StallWatchdog(0.15, action=lambda: fired.append(1),
                           hard_action=lambda: None, poll_s=0.03)
        wd.start()
        wd.beat()
        wd.grace(0.6)  # "validation sweep with compiles"
        time.sleep(0.45)  # several thresholds deep into the phase
        assert not fired
        wd.beat()  # phase done, steps resume
        time.sleep(0.2)
        assert not fired
        wd.stop()

    def test_grace_expiry_restores_stall_detection(self):
        fired = []
        wd = StallWatchdog(0.1, action=lambda: fired.append(1),
                           hard_action=lambda: None, poll_s=0.02)
        wd.start()
        wd.beat()
        wd.grace(0.2)
        # no beat ever lands again: once grace expires the watchdog gets
        # one full threshold from expiry, then fires
        assert _spin_until(lambda: fired, timeout=5.0)
        wd.stop()


class TestSupervisor:
    def _mk_ckpt(self, runs_dir, folder, it):
        p = os.path.join(runs_dir, folder, f"ckpt_{it}")
        os.makedirs(p, exist_ok=True)
        return p

    def test_find_latest_ckpt_across_leg_folders(self, tmp_path):
        runs = str(tmp_path / "runs")
        self._mk_ckpt(runs, "job_2026-01-01T00-00-00", 500)
        want = self._mk_ckpt(runs, "job_2026-01-01T01-00-00", 1200)
        self._mk_ckpt(runs, "job_2026-01-01T01-00-00", 900)
        self._mk_ckpt(runs, "otherjob_2026-01-01T02-00-00", 9999)
        path, it = find_latest_ckpt(runs, "job")
        assert (path, it) == (want, 1200)
        assert find_latest_ckpt(runs, "missing") == (None, 0)

    def _base_cfg(self, tmp_path, niter=4):
        cfg = tmp_path / "job.ini"
        cfg.write_text(
            "[DEFAULT]\nname = job\nload_model_from_save = False\n"
            "[ENV]\nroot_path = %s\nruns_subpath = /runs\n"
            "[TRAINING]\nniter = %d\nresume_training_from_save = False\n"
            % (tmp_path, niter)
        )
        return str(cfg)

    def test_write_resume_cfg(self, tmp_path):
        cfg = self._base_cfg(tmp_path)
        out = write_resume_cfg(cfg, str(tmp_path / "ckpt_2"),
                               str(tmp_path / "resume.ini"))
        import configparser
        p = configparser.ConfigParser()
        p.read(out)
        assert p.getboolean("DEFAULT", "load_model_from_save")
        assert p.getboolean("TRAINING", "resume_training_from_save")
        assert p.get("ENV", "state_load_path").endswith("ckpt_2")
        assert p.getint("TRAINING", "niter") == 4

    def test_supervise_relaunches_until_niter(self, tmp_path):
        """Fake runner: leg 0 'stalls out' at it 2 (exit 86), leg 1
        resumes and finishes. Exercises ckpt discovery + resume-config
        generation + the stop condition end to end."""
        cfg = self._base_cfg(tmp_path, niter=4)
        runs = str(tmp_path / "runs")
        fake = tmp_path / "fake_runner.py"
        fake.write_text(
            "import configparser, os, sys\n"
            "cfg = sys.argv[sys.argv.index('--cfg') + 1]\n"
            "p = configparser.ConfigParser(); p.read(cfg)\n"
            "resume = p.getboolean('TRAINING', 'resume_training_from_save')\n"
            "runs = %r\n"
            "if not resume:\n"
            "    os.makedirs(os.path.join(runs, 'job_leg0/ckpt_2'))\n"
            "    sys.exit(86)\n"
            "assert p.get('ENV', 'state_load_path').endswith('ckpt_2')\n"
            "os.makedirs(os.path.join(runs, 'job_leg1/ckpt_4'))\n"
            "sys.exit(0)\n" % runs
        )
        logs = []
        legs = supervise(
            cfg, [], max_restarts=3, backoff_s=0,
            runner=[sys.executable, str(fake)], log=logs.append,
        )
        assert [(l["rc"], l["reached_it"]) for l in legs] == [(86, 2), (0, 4)]
        assert any("niter=4 reached" in m for m in logs)

    def test_supervise_gives_up_without_checkpoint(self, tmp_path):
        cfg = self._base_cfg(tmp_path, niter=4)
        fake = tmp_path / "fake_runner.py"
        fake.write_text("import sys; sys.exit(1)\n")
        logs = []
        legs = supervise(cfg, [], max_restarts=3, backoff_s=0,
                         runner=[sys.executable, str(fake)],
                         log=logs.append)
        assert len(legs) == 1 and legs[0]["rc"] == 1
        assert any("no checkpoint" in m for m in logs)

    def test_supervise_restarts_from_scratch_on_stall_exit(self, tmp_path):
        """Stall hard-exit (rc 86) BEFORE the first checkpoint must
        relaunch from scratch, not give up — a dead runtime at startup
        is recoverable (measured: third tunnel outage of the 30k-run
        night hung a leg before its first step)."""
        cfg = self._base_cfg(tmp_path, niter=4)
        runs = str(tmp_path / "runs")
        marker = tmp_path / "tried_once"
        fake = tmp_path / "fake_runner.py"
        fake.write_text(
            "import configparser, os, sys\n"
            "cfg = sys.argv[sys.argv.index('--cfg') + 1]\n"
            "p = configparser.ConfigParser(); p.read(cfg)\n"
            "assert not p.getboolean('TRAINING', 'resume_training_from_save')\n"
            "marker = %r\n"
            "if not os.path.exists(marker):\n"
            "    open(marker, 'w').close()\n"
            "    sys.exit(86)\n"  # stall death, no checkpoint written
            "os.makedirs(os.path.join(%r, 'job_leg1/ckpt_4'))\n"
            "sys.exit(0)\n" % (str(marker), runs)
        )
        logs = []
        legs = supervise(cfg, [], max_restarts=3, backoff_s=0,
                         runner=[sys.executable, str(fake)],
                         log=logs.append)
        assert [(l["rc"], l["reached_it"]) for l in legs] == [(86, 0), (0, 4)]
        assert any("relaunching from scratch" in m for m in logs)


def test_train_loop_arms_and_stops_watchdog(tmp_path, monkeypatch):
    """Loop integration: stall_watchdog_s > 0 arms the watchdog, the run
    completes normally (beats keep it quiet), and it is stopped after."""
    import gan_sr_wind_field_tpu.train.watchdog as wmod
    from gan_sr_wind_field_tpu.data import preprocess
    from gan_sr_wind_field_tpu.train.loop import train
    from gan_sr_wind_field_tpu.utils.logging import setup_loggers
    from tests.test_chunked_loop import _cfg

    created = []
    real = wmod.StallWatchdog

    class Spy(real):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            created.append(self)

    monkeypatch.setattr(wmod, "StallWatchdog", Spy)

    cfg = _cfg(tmp_path, niter=3, chunk=1)
    cfg.training.stall_watchdog_s = 60.0
    setup_loggers(str(tmp_path / "log"), also_log_to_terminal=False)
    ds_train, _, _, x, y = preprocess(
        cfg, synthetic=True, synthetic_hours=10, synthetic_size=32
    )
    state = train(cfg, ds_train, None, x, y)
    assert int(state.it) == 3
    assert len(created) == 1
    wd = created[0]
    assert wd._last_beat is not None          # armed by real steps
    assert wd._stop.is_set()                  # stopped on loop exit
    assert np.isfinite(float(state.it))


class TestStartupDeadline:
    def test_fires_when_first_step_never_arrives(self):
        fired = []
        wd = StallWatchdog(10.0, action=lambda: fired.append(1),
                           hard_action=lambda: None, poll_s=0.03,
                           startup_deadline_s=0.2)
        wd.start()
        assert _spin_until(lambda: fired)  # never beaten — startup bound
        wd.stop()

    def test_no_startup_deadline_means_unarmed_never_fires(self):
        fired = []
        wd = StallWatchdog(0.05, action=lambda: fired.append(1),
                           hard_action=lambda: None, poll_s=0.02)
        wd.start()
        time.sleep(0.3)
        assert not fired
        wd.stop()

    def test_first_beat_switches_to_step_threshold(self):
        fired = []
        wd = StallWatchdog(5.0, action=lambda: fired.append(1),
                           hard_action=lambda: None, poll_s=0.02,
                           startup_deadline_s=0.15)
        wd.start()
        wd.beat()          # arrives before the startup deadline
        time.sleep(0.4)    # > startup deadline but < step threshold
        assert not fired
        wd.stop()
