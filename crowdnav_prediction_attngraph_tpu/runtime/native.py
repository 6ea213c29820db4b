"""ctypes binding for the native ORCA engine (runtime/orca_engine.cc).

Builds the shared library on first use (g++ is part of the toolchain; no
pybind11 needed). Used as an independent oracle for the JAX kernel and as a
fast host crowd stepper."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "orca_engine.cc")
_LIB = os.path.join(_HERE, "liborca_engine.so")

_lib = None


def _build():
    subprocess.check_call(
        ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC])


def load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or \
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        _build()
    lib = ctypes.CDLL(_LIB)
    dp = ctypes.POINTER(ctypes.c_double)
    up = ctypes.POINTER(ctypes.c_ubyte)
    lib.orca_velocity.argtypes = [dp, dp, ctypes.c_double, ctypes.c_double,
                                  dp, dp, dp, dp, up, ctypes.c_int,
                                  ctypes.c_double, ctypes.c_double,
                                  ctypes.c_double, dp]
    lib.orca_velocity.restype = None
    lib.orca_crowd_step.argtypes = [ctypes.c_int, dp, dp, dp, dp, dp,
                                    ctypes.c_double, ctypes.c_double,
                                    ctypes.c_double, ctypes.c_double]
    lib.orca_crowd_step.restype = None
    _lib = lib
    return lib


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def orca_velocity_native(ego_pos, ego_vel, ego_radius, max_speed, pref_vel,
                         nbr_pos, nbr_vel, nbr_radius, nbr_mask, time_step,
                         time_horizon, neighbor_dist):
    lib = load()
    ego_pos = np.ascontiguousarray(ego_pos, np.float64)
    ego_vel = np.ascontiguousarray(ego_vel, np.float64)
    pref_vel = np.ascontiguousarray(pref_vel, np.float64)
    nbr_pos = np.ascontiguousarray(nbr_pos, np.float64)
    nbr_vel = np.ascontiguousarray(nbr_vel, np.float64)
    nbr_radius = np.ascontiguousarray(nbr_radius, np.float64)
    nbr_mask = np.ascontiguousarray(nbr_mask, np.uint8)
    out = np.zeros(2, np.float64)
    lib.orca_velocity(
        _dp(ego_pos), _dp(ego_vel), float(ego_radius), float(max_speed),
        _dp(pref_vel), _dp(nbr_pos), _dp(nbr_vel), _dp(nbr_radius),
        nbr_mask.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        len(nbr_radius), float(time_step), float(time_horizon),
        float(neighbor_dist), _dp(out))
    return out


def orca_crowd_step_native(pos, vel, radius, v_pref, goal, safety_space,
                           time_step, time_horizon, neighbor_dist):
    """In-place crowd step; returns updated (pos, vel)."""
    lib = load()
    pos = np.ascontiguousarray(pos, np.float64)
    vel = np.ascontiguousarray(vel, np.float64)
    radius = np.ascontiguousarray(radius, np.float64)
    v_pref = np.ascontiguousarray(v_pref, np.float64)
    goal = np.ascontiguousarray(goal, np.float64)
    lib.orca_crowd_step(len(radius), _dp(pos), _dp(vel), _dp(radius),
                        _dp(v_pref), _dp(goal), float(safety_space),
                        float(time_step), float(time_horizon),
                        float(neighbor_dist))
    return pos, vel
