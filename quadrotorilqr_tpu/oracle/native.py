"""ctypes binding to the native C++ oracle (native/qilqr_oracle.cc).

The C++ library plays the role the reference's C++ core plays upstream
(/root/reference/src/ilqr.hh compiled via Bazel + pybind11): a fast, exact
float64 host-side solver. Here it is consumed through ctypes on flat
float64 arrays — no pybind11 dependency — and auto-built with `make` on
first use.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libqilqr_oracle.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    d = ctypes.POINTER(ctypes.c_double)
    lib.qilqr_solve.restype = ctypes.c_int
    lib.qilqr_solve.argtypes = [
        ctypes.c_double, d, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        d, d, d, d, d, d,
        ctypes.c_int, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_int,
        d, d, d, ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _pack_states(quat, trans, vel):
    """(N,4),(N,3),(N,6) -> (N,13) packed float64."""
    return np.ascontiguousarray(
        np.concatenate(
            [np.asarray(quat), np.asarray(trans), np.asarray(vel)], axis=-1
        ),
        np.float64,
    )


def solve(
    mass_kg,
    inertia,
    arm_length_m,
    torque_to_thrust_ratio_m,
    g_mpss,
    q_mat,
    r_mat,
    desired_quat,
    desired_trans,
    desired_vel,
    desired_controls,
    init_quat,
    init_trans,
    init_vel,
    init_controls,
    dt_s,
    ls_step_update=0.5,
    ls_frac=0.5,
    ls_max_iters=100,
    rtol=1e-12,
    atol=1e-12,
    max_iters=100,
):
    """One reference-semantics solve. Returns a dict with packed outputs.

    status: 0 max_iters, 1 converged, 2 line-search failed, -1 Quu not PD.
    """
    lib = _load()
    d = ctypes.POINTER(ctypes.c_double)

    def p(a):
        return np.ascontiguousarray(a, np.float64).ctypes.data_as(d)

    desired = _pack_states(desired_quat, desired_trans, desired_vel)
    init = _pack_states(init_quat, init_trans, init_vel)
    n = init.shape[0]
    out_states = np.zeros((n, 13), np.float64)
    out_controls = np.zeros((n, 4), np.float64)
    out_cost = np.zeros((1,), np.float64)
    out_iters = ctypes.c_int(0)

    inertia = np.ascontiguousarray(inertia, np.float64)
    status = lib.qilqr_solve(
        float(mass_kg), p(inertia), float(arm_length_m),
        float(torque_to_thrust_ratio_m), float(g_mpss),
        p(q_mat), p(r_mat), p(desired), p(np.asarray(desired_controls)),
        p(init), p(np.asarray(init_controls)),
        n, float(dt_s),
        float(ls_step_update), float(ls_frac), int(ls_max_iters),
        float(rtol), float(atol), int(max_iters),
        p(out_states), p(out_controls), p(out_cost), ctypes.byref(out_iters),
    )
    return {
        "status": status,
        "quat": out_states[:, 0:4],
        "trans": out_states[:, 4:7],
        "vel": out_states[:, 7:13],
        "controls": out_controls,
        "cost": float(out_cost[0]),
        "iterations": int(out_iters.value),
    }
