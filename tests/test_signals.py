"""Signal handling (reference: utils/connect_signals.c:23-47 + the per-
iteration poll at solvers.F90:1174-1222): SIGUSR1 writes the current
solution and continues; SIGUSR2 writes and stops the solve."""

import glob
import os
import signal
import threading
import time

import pytest

from adflow_tpu.api.solver import ADFLOW
from adflow_tpu.core.refstate import AeroProblem
from adflow_tpu.meshgen.analytic import naca0012_omesh


def test_sigusr2_writes_and_stops(tmp_path):
    mesh = naca0012_omesh(ni=48, nj=16)
    solver = ADFLOW(options={
        "equationType": "euler", "useANKSolver": True, "nCycles": 2000,
        "printIterations": False, "printTiming": False,
        "L2Convergence": 1e-14,          # unreachable: must be interrupted
        "outputDirectory": str(tmp_path)}, mesh=mesh)
    ap = AeroProblem(name="sig", mach=0.5, alpha=2.0)
    pid = os.getpid()

    def fire():
        time.sleep(10)
        os.kill(pid, signal.SIGUSR2)

    threading.Thread(target=fire, daemon=True).start()
    t0 = time.time()
    solver(ap)
    wall = time.time() - t0
    assert wall < 1200, "solve did not stop on SIGUSR2"
    written = glob.glob(str(tmp_path / "*sig*"))
    assert any(f.endswith(".cgns") for f in written), written
    # handlers restored after the solve
    assert signal.getsignal(signal.SIGUSR2) in (
        signal.SIG_DFL, signal.default_int_handler, None,
        signal.Handlers.SIG_DFL)
