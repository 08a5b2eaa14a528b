"""Subprocess simulation runner with live output streaming.

Reference: /root/reference/safeincave/app/simulator_runner.py:3-50 - launch
the headless CLI in a clean interpreter, stream its stdout line-by-line to a
callback (the GUI console in the reference; any callable here), and support
cooperative stop/terminate.
"""
from __future__ import annotations

import os
import subprocess
import sys
import threading


class SimulatorRunner:
    def __init__(self, output_callback=None):
        self.output_callback = output_callback
        self.proc: subprocess.Popen | None = None
        self.listener_thread: threading.Thread | None = None
        self.jsonfilename = ""

    def setJsonFile(self, filename: str):
        self.jsonfilename = filename

    def run(self):
        """Start `python -m safeincave_tpu.app.sim_cli --json <file>` in a
        fresh interpreter and stream its combined stdout/stderr."""
        self.stop()  # if already running
        # make the (possibly uninstalled) package importable in the child
        pkg_parent = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        env = dict(os.environ)
        env["PYTHONPATH"] = pkg_parent + os.pathsep + \
            env.get("PYTHONPATH", "")
        self.proc = subprocess.Popen(
            [sys.executable, "-m", "safeincave_tpu.app.sim_cli",
             "--json", self.jsonfilename],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            bufsize=1,
            close_fds=True,
            env=env,
        )

        def listen():
            try:
                assert self.proc.stdout is not None
                for line in self.proc.stdout:
                    if self.output_callback:
                        self.output_callback(line)
            finally:
                if self.proc and self.proc.stdout:
                    self.proc.stdout.close()

        self.listener_thread = threading.Thread(target=listen, daemon=True)
        self.listener_thread.start()

    def wait(self, timeout=None) -> int | None:
        """Block until the simulation exits; returns its return code."""
        if self.proc is None:
            return None
        rc = self.proc.wait(timeout=timeout)
        if self.listener_thread is not None:
            self.listener_thread.join(timeout=5)
        return rc

    def stop(self):
        if self.proc and self.proc.poll() is None:
            self.proc.terminate()
            try:
                self.proc.wait(timeout=5)
            except subprocess.TimeoutExpired:
                self.proc.kill()
                self.proc.wait()
            if self.output_callback:
                self.output_callback("\nSimulation terminated by user.\n")
        self.proc = None
