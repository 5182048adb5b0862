"""Option-system effect tests.

Reference analogue: the option unit tests of
`/root/reference/tests/unit_tests/test_basics.py:19-60` (every option must
be settable and have its documented effect). The consumption scan guards
against accepted-but-ignored options — an option either does something or
is listed in the explicit _INERT_OPTIONS set.
"""

import io
import pathlib
import time
import tokenize

import pytest

from adflow_tpu.api.solver import ADFLOW
from adflow_tpu.core.refstate import AeroProblem
from adflow_tpu.meshgen.analytic import cube_mesh, naca0012_omesh
from adflow_tpu.options import _DEFAULT_OPTIONS, _INERT_OPTIONS, Options

PKG = pathlib.Path(__file__).resolve().parents[1] / "adflow_tpu"


def _code_only(src: str) -> str:
    """Source with comments and docstrings stripped — a mention of an
    option name in prose must NOT count as consumption (an option is
    consumed via opts['Name'] string keys, which survive: only
    statement-position strings are docstrings)."""
    out = []
    stmt_start = True    # next STRING at statement position = docstring
    for tok in tokenize.generate_tokens(io.StringIO(src).readline):
        if tok.type in (tokenize.COMMENT, tokenize.NL, tokenize.ENCODING):
            continue
        if tok.type in (tokenize.NEWLINE, tokenize.INDENT,
                        tokenize.DEDENT):
            stmt_start = True
            continue
        if tok.type == tokenize.STRING and stmt_start:
            continue             # docstring / bare string statement
        stmt_start = False
        out.append(tok.string)
    return " ".join(out)


def test_every_option_is_consumed_or_declared_inert():
    """Every default option name must appear in executable source (outside
    options.py, excluding comments and docstrings) or be in the documented
    inert set — no silent no-op options."""
    src = ""
    for p in PKG.rglob("*.py"):
        if p.name == "options.py":
            continue
        src += _code_only(p.read_text())
    missing = []
    for name in _DEFAULT_OPTIONS:
        if name in _INERT_OPTIONS:
            continue
        if name not in src:
            missing.append(name)
    assert not missing, f"accepted-but-unused options: {missing}"


def test_inert_options_do_not_claim_consumption():
    for name in _INERT_OPTIONS:
        assert name in _DEFAULT_OPTIONS or name.lower() in (
            k.lower() for k in _DEFAULT_OPTIONS)


def test_unknown_option_suggestion():
    with pytest.raises(ValueError, match="did you mean"):
        Options({"L2Convergance": 1e-8})


def test_turb_res_scale_default_and_override():
    mesh = cube_mesh(n=4)
    s = ADFLOW(options={"equationType": "RANS", "printIterations": False,
                        "printTiming": False}, mesh=mesh)
    # SA default (reference _updateTurbResScale: pyADflow.py:6582)
    assert s.cfg.turb_scales == (1e4,)
    s2 = ADFLOW(options={"equationType": "RANS", "turbResScale": 123.0,
                         "printIterations": False, "printTiming": False},
                mesh=mesh)
    assert s2.cfg.turb_scales == (123.0,)
    s3 = ADFLOW(options={"equationType": "RANS", "turbulenceModel": "SST",
                         "printIterations": False, "printTiming": False},
                mesh=mesh)
    assert s3.cfg.turb_scales == (1e3, 1e-6)
    s4 = ADFLOW(options={"equationType": "euler", "printIterations": False,
                         "printTiming": False}, mesh=mesh)
    assert s4.cfg.turb_scales == ()


def test_dadi_smoother_converges():
    """smoother='DADI' must actually run the DADI driver and converge the
    NACA0012 Euler case (reference DADISmoother, smoothers.F90:383)."""
    mesh = naca0012_omesh(ni=48, nj=16)
    opts = {"equationType": "euler", "useANKSolver": False,
            "useNKSolver": False, "smoother": "DADI", "CFL": 32.0,
            "nCycles": 600, "L2Convergence": 1e-3,
            "printIterations": False, "printTiming": False}
    s = ADFLOW(options=opts, mesh=mesh)
    ap = AeroProblem(name="dadi12", mach=0.5, alpha=1.0)
    s(ap)
    assert s.solve_info.converged
    # RK cannot run CFL 32 at all — the option's effect is the much faster
    # implicit march at equal iteration budget
    opts_rk = dict(opts, smoother="Runge-Kutta", CFL=1.5)
    s2 = ADFLOW(options=opts_rk, mesh=mesh)
    s2(AeroProblem(name="rk12", mach=0.5, alpha=1.0))
    assert s.solve_info.iterations <= s2.solve_info.iterations


def test_time_limit_stops_solve():
    mesh = naca0012_omesh(ni=48, nj=16)
    opts = {"equationType": "euler", "useANKSolver": False,
            "useNKSolver": False, "nCycles": 100000,
            "L2Convergence": 1e-14, "timeLimit": 1.5,
            "printIterations": False, "printTiming": False}
    s = ADFLOW(options=opts, mesh=mesh)
    t0 = time.time()
    s(AeroProblem(name="tl", mach=0.5, alpha=1.0))
    # generous bound: one chunk past the limit plus compile time
    assert time.time() - t0 < 90.0
    assert not s.solve_info.converged


def test_monitor_variables_columns(capsys):
    mesh = cube_mesh(n=4)
    opts = {"equationType": "euler", "useANKSolver": False,
            "useNKSolver": False, "nCycles": 25,
            "monitorVariables": ["cpu", "resrho", "cl", "cd"],
            "printTiming": False}
    s = ADFLOW(options=opts, mesh=mesh)
    s(AeroProblem(name="mon", mach=0.5, alpha=1.0))
    out = capsys.readouterr().out
    assert "resrho" in out and "cl" in out and "cd" in out
