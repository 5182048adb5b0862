"""Minimal OpenMDAO API stand-in for exercising the MPhys components.

openmdao is not part of this image; this stub honors the subset of the
``openmdao.api`` contract the components in
``adflow_tpu/integrations/mphys.py`` use (options.declare,
add_input/add_output with shape/val, dict-like inputs/outputs/residuals
vectors, Implicit/Explicit component method signatures) so the REAL
component code paths run in tests. Install with ``install_stub()`` before
importing anything that does ``import openmdao.api as om``.
"""

import sys
import types

import numpy as np


class _Options(dict):
    def declare(self, name, default=None, **kw):
        self.setdefault(name, default)


class _Vector(dict):
    """dict-of-ndarray with +=-friendly semantics."""

    def zero(self):
        for k in self:
            self[k] = np.zeros_like(self[k])


class _Component:
    def __init__(self, **opts):
        self.options = _Options()
        self.initialize()
        for k, v in opts.items():
            self.options[k] = v
        self._in_meta = {}
        self._out_meta = {}

    # -- authoring API ---------------------------------------------------
    def initialize(self):
        pass

    def setup(self):
        pass

    def add_input(self, name, shape=None, val=None):
        self._in_meta[name] = (shape, val)

    def add_output(self, name, shape=None, val=None):
        self._out_meta[name] = (shape, val)

    # -- harness API -----------------------------------------------------
    def _make_vec(self, meta):
        v = _Vector()
        for name, (shape, val) in meta.items():
            if val is not None:
                v[name] = np.array(val, float).reshape(-1)
            else:
                v[name] = np.zeros(int(np.prod(shape or 1)))
        return v

    def setup_run(self):
        self.setup()
        self.inputs = self._make_vec(self._in_meta)
        self.outputs = self._make_vec(self._out_meta)
        self.residuals = _Vector(
            {k: np.zeros_like(v) for k, v in self.outputs.items()})
        return self


class ImplicitComponent(_Component):
    def apply_nonlinear(self, inputs, outputs, residuals):
        raise NotImplementedError

    def solve_nonlinear(self, inputs, outputs):
        raise NotImplementedError

    def apply_linear(self, inputs, outputs, d_inputs, d_outputs,
                     d_residuals, mode):
        raise NotImplementedError


class ExplicitComponent(_Component):
    def compute(self, inputs, outputs):
        raise NotImplementedError

    def compute_jacvec_product(self, inputs, d_inputs, d_outputs, mode):
        pass


def install_stub():
    """Register this module as ``openmdao``/``openmdao.api``."""
    om_api = types.ModuleType("openmdao.api")
    om_api.ImplicitComponent = ImplicitComponent
    om_api.ExplicitComponent = ExplicitComponent
    om_api.Options = _Options
    om = types.ModuleType("openmdao")
    om.api = om_api
    sys.modules.setdefault("openmdao", om)
    sys.modules["openmdao.api"] = om_api
    return om_api
