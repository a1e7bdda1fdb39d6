"""Step-progress stall watchdog (elastic recovery, SURVEY.md §5).

Remote-runtime RPCs can hang indefinitely: measured twice in one night on
the 30k evidence run (docs/evidence/longrun30k.md) — the training process
froze mid-step with zero CPU-time progress, once under host contention
and once from an unprovoked tunnel outage. ``jax`` offers no client-side
dispatch timeout, so recovery must come from outside the blocked call:
a POSIX signal with a registered Python handler EINTRs the wait, and the
train loop's existing SIGTERM preemption path then checkpoints and exits
cleanly (train/loop.py). When even that cannot complete (runtime fully
dead), the only safe move is a hard exit — the last periodic checkpoint
stands and a supervisor relaunches (scripts/supervise_train.py).

``StallWatchdog`` automates exactly that escalation from a daemon
thread:

- the hot loop calls :meth:`beat` once per completed iteration;
- the watchdog ARMS on the first beat (remote compiles legitimately take
  many minutes before step 1 — they must not trip it);
- if no beat lands for ``threshold_s``, it fires ``SIGTERM`` at its own
  process (graceful checkpoint+exit via the loop's handler);
- if the stall persists through ``max_fires`` thresholds, it hard-exits
  with :data:`STALL_EXIT_CODE` so a supervisor can distinguish
  watchdog death (relaunch from checkpoint) from real errors.

Enable with ``[TRAINING] stall_watchdog_s = <seconds>`` (0 = off, the
default — short CPU smoke runs and tests don't want a watchdog thread).
Pick a threshold well above one validation sweep + one checkpoint save;
300 s is a good value at cluster geometry (steps are ~0.4 s, val sweeps
~30 s, saves ~30 s).

The reference has no counterpart (its failure story is manual restart,
reference train.py:90-102); this subsystem exists because the TPU-first
deployment target — preemptible pods behind remote runtimes — needs it.
"""

from __future__ import annotations

import logging
import os
import signal
import threading
import time

STALL_EXIT_CODE = 86


class StallWatchdog:
    """Fire escalating recovery actions when step progress stops.

    Parameters
    ----------
    threshold_s : float
        Seconds without a :meth:`beat` before firing. The clock only
        starts at the FIRST beat (compiles don't count).
    max_fires : int
        Graceful attempts (SIGTERM to self) before the hard exit.
    action : callable, optional
        Replaces the SIGTERM-to-self graceful action (tests).
    hard_action : callable, optional
        Replaces ``os._exit(STALL_EXIT_CODE)`` (tests).
    poll_s : float, optional
        Check interval; default ``threshold_s / 4``.
    startup_deadline_s : float, optional
        Seconds allowed from :meth:`start` to the FIRST beat before the
        same escalation fires. A leg launched into a dead runtime hangs
        in backend init / first compile and never beats — without this
        deadline the watchdog never arms (observed on the third tunnel
        outage of the 30k evidence-run night). Set it well above a cold
        first compile + data upload; 0/None disables (default).
    """

    def __init__(self, threshold_s: float, max_fires: int = 2,
                 action=None, hard_action=None, poll_s: float = None,
                 startup_deadline_s: float = None):
        self.threshold_s = float(threshold_s)
        self.max_fires = int(max_fires)
        self.startup_deadline_s = float(startup_deadline_s or 0)
        self._action = action or self._sigterm_self
        self._hard_action = hard_action or self._hard_exit
        self._poll_s = poll_s if poll_s is not None else self.threshold_s / 4
        self._last_beat = None  # None = not armed yet
        self._grace_until = 0.0
        self._t_start = None
        self._fires = 0
        self._stop = threading.Event()
        self._thread = None
        self._log = logging.getLogger("status")

    # -- actions ----------------------------------------------------------
    @staticmethod
    def _sigterm_self():
        os.kill(os.getpid(), signal.SIGTERM)

    @staticmethod
    def _hard_exit():
        os._exit(STALL_EXIT_CODE)

    # -- lifecycle --------------------------------------------------------
    def start(self):
        if self.threshold_s <= 0:
            return self
        self._t_start = time.monotonic()
        self._thread = threading.Thread(
            target=self._watch, name="stall-watchdog", daemon=True
        )
        self._thread.start()
        return self

    def beat(self):
        """Mark progress (call once per completed iteration)."""
        self._last_beat = time.monotonic()
        self._fires = 0

    def grace(self, seconds):
        """Defer firing until ``seconds`` from now (monotonic).

        Call immediately BEFORE a known-long host-blocking phase that
        does not beat — a validation sweep whose graphs still need a
        remote compile (1–5 min each over the tunnel), a checkpoint
        save at large geometry. Measured need: the 30k evidence run's
        first val sweep (val-metrics compile + full-volume figure-SR
        compile) ran >352 s without a step beat and drew a spurious
        SIGTERM at threshold 300 s. Beats resume normal cadence once
        the phase completes; if the phase itself hangs past the grace
        window, the watchdog still fires."""
        until = time.monotonic() + float(seconds)
        self._grace_until = max(self._grace_until, until)

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2 * self._poll_s + 1)

    # -- the watch loop ---------------------------------------------------
    def _watch(self):
        while not self._stop.wait(self._poll_s):
            last = self._last_beat
            if last is None:  # not armed: still compiling / warming up
                if not self.startup_deadline_s:
                    continue
                waited = time.monotonic() - self._t_start
                if waited < self.startup_deadline_s * (self._fires + 1):
                    continue
                stalled_for = waited  # never reached the first step
            else:
                now = time.monotonic()
                if now < self._grace_until:
                    continue
                stalled_for = now - max(last, self._grace_until)
                if stalled_for < self.threshold_s * (self._fires + 1):
                    continue
            self._fires += 1
            if self._fires <= self.max_fires:
                self._log.critical(
                    "stall watchdog: no step progress for %.0f s — "
                    "sending SIGTERM to self (graceful checkpoint+exit), "
                    "attempt %d/%d",
                    stalled_for, self._fires, self.max_fires,
                )
                self._action()
            else:
                self._log.critical(
                    "stall watchdog: still no progress %.0f s after %d "
                    "SIGTERM attempts — hard exit %d (resume from the "
                    "last checkpoint)",
                    stalled_for, self.max_fires, STALL_EXIT_CODE,
                )
                self._hard_action()
                return
