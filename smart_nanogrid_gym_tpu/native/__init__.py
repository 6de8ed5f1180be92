"""ctypes bindings for the native C++ runtime (see nanogrid_native.cpp).

Provides:

- :func:`generate_schedule_native` — bit-exact replay of the reference's
  day-generation RNG stream from a numpy-style integer seed (the reference's
  ``np.random.seed(seed)`` global-MT19937 stream, charging_station.py:200-279).
- :class:`NativeEngine` — a standalone CPU serving engine with the exact
  environment semantics; no Python/numpy/JAX in the step loop.

The shared library is compiled on demand with g++ (once per checkout).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libnanogrid_native.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(
        os.path.join(_DIR, "nanogrid_native.cpp")
    ):
        subprocess.run(["make", "-C", _DIR], check=True, capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    D = ctypes.POINTER(ctypes.c_double)
    lib.ng_generate_schedule.restype = ctypes.c_int
    lib.ng_generate_schedule.argtypes = [
        ctypes.c_uint32, ctypes.c_int, ctypes.c_double, ctypes.c_int,
        ctypes.c_int, ctypes.c_int] + [D] * 8
    lib.ng_engine_new.restype = ctypes.c_void_p
    lib.ng_engine_new.argtypes = [
        ctypes.c_int, ctypes.c_double, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, D, ctypes.c_int, D, D, ctypes.c_int]
    lib.ng_engine_free.argtypes = [ctypes.c_void_p]
    lib.ng_engine_obs_dim.restype = ctypes.c_int
    lib.ng_engine_obs_dim.argtypes = [ctypes.c_void_p]
    lib.ng_engine_reset.argtypes = [ctypes.c_void_p] + [D] * 8 + [
        ctypes.c_double, ctypes.c_double, D]
    lib.ng_engine_step.restype = ctypes.c_int
    lib.ng_engine_step.argtypes = [ctypes.c_void_p, D, D, D, D, D]
    lib.ng_batch_new.restype = ctypes.c_void_p
    lib.ng_batch_new.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, D, ctypes.c_int, D, D,
        ctypes.c_int]
    lib.ng_batch_free.argtypes = [ctypes.c_void_p]
    lib.ng_batch_obs_dim.restype = ctypes.c_int
    lib.ng_batch_obs_dim.argtypes = [ctypes.c_void_p]
    lib.ng_batch_reset_env.argtypes = [ctypes.c_void_p, ctypes.c_int] + [D] * 8 + [
        ctypes.c_double, ctypes.c_double, D]
    lib.ng_batch_step.restype = ctypes.c_int
    lib.ng_batch_step.argtypes = [ctypes.c_void_p] + [D] * 6
    _lib = lib
    return lib


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


_SCHEDULE_FIELDS = (
    "occupancy", "capacity", "requested_soc", "soc_init",
    "is_arrival", "dep_obs", "mask_departing", "mask_departing3",
)


def generate_schedule_native(
    seed: int,
    num_chargers: int,
    time_interval: float = 1.0,
    table_len: int | None = None,
    different_capacities: bool = True,
    requested_soc: bool = False,
) -> dict[str, np.ndarray]:
    """Generate one day bit-identically to the reference under
    ``np.random.seed(seed)``.  Returns dict of (N, L) float64 tables."""
    lib = _load()
    T = int(round(24.0 / time_interval))
    L = table_len or (T + 1)
    arrays = {name: np.zeros((num_chargers, L), dtype=np.float64) for name in _SCHEDULE_FIELDS}
    rc = lib.ng_generate_schedule(
        seed, num_chargers, time_interval, L,
        int(different_capacities), int(requested_soc),
        *[_ptr(arrays[name]) for name in _SCHEDULE_FIELDS],
    )
    if rc != 0:
        raise RuntimeError(f"ng_generate_schedule failed with {rc}")
    return arrays


_PENALTY_MODES = {"no_penalty": 0, "on_departure": 1, "sparse": 2, "dense": 3}

INFO_FIELDS = (
    "total_cost", "grid_energy_cost", "grid_energy", "grid_power",
    "utilized_solar_energy", "total_penalty", "total_battery_penalty",
    "total_vehicle_penalty", "battery_action", "total_charging_power",
    "total_discharging_power", "battery_power_value",
    "battery_calculated_power_value", "battery_state_of_charge",
    "initial_battery_state_of_charge",
    "discharging_nonexistent_vehicles_penalty",
)


class NativeEngine:
    """Standalone CPU environment engine (exact reference semantics)."""

    def __init__(self, config, params=None):
        """``config``: a core.NanogridConfig.  ``params``: optional
        core.NanogridParams (for price/solar tables); when omitted the tables
        are built numpy-only — no JAX import anywhere in the native path."""
        lib = _load()
        self.config = config
        if params is None:
            from ..core import prices as prices_mod, solar as solar_mod

            price_table, _ = prices_mod.build_price_table(config.price_model, config.price_table_len)
            if config.pv_system:
                irr, solar_power, max_rad = solar_mod.build_solar_tables(
                    config.time_interval, config.steps_per_day
                )
                rad_norm = irr / max_rad
            else:
                solar_power = np.zeros(config.solar_table_len)
                rad_norm = np.zeros(config.solar_table_len)
            price = np.ascontiguousarray(price_table, dtype=np.float64)
            rad = np.ascontiguousarray(rad_norm, dtype=np.float64)
            solar = np.ascontiguousarray(solar_power, dtype=np.float64)
        else:
            price = np.ascontiguousarray(np.asarray(params.price, dtype=np.float64))
            rad = np.ascontiguousarray(np.asarray(params.rad_norm, dtype=np.float64))
            solar = np.ascontiguousarray(np.asarray(params.solar_power, dtype=np.float64))
        # obs lookahead parameterized from config (reference NUMBER_OF_HOURS_AHEAD
        # counts timesteps, SURVEY.md Q11); the sparse-penalty 3-step window is
        # separate and intentionally fixed (Q10: the reference's
        # check_is_vehicle_departing_in_next_n_timesteps ignores its n).
        if config.lookahead >= config.steps_per_day:
            raise ValueError(
                f"lookahead {config.lookahead} must stay within the padded "
                f"2-day tables (< {config.steps_per_day} timesteps)"
            )
        self._h = lib.ng_engine_new(
            config.num_chargers, config.time_interval,
            int(config.pv_system), int(config.battery_system),
            int(config.vehicle_to_everything), int(config.penalty_mode),
            int(config.lookahead),
            _ptr(price), len(price), _ptr(rad), _ptr(solar), len(solar),
        )
        self._lib = lib
        self.obs_dim = lib.ng_engine_obs_dim(self._h)
        self.num_actions = config.num_chargers + int(config.battery_system)
        self._obs = np.zeros(self.obs_dim, dtype=np.float64)
        self._reward = np.zeros(1, dtype=np.float64)
        self._info = np.zeros(16, dtype=np.float64)
        self._powers = np.zeros(config.num_chargers, dtype=np.float64)

    def reset(self, schedule: dict[str, np.ndarray], batt_soc: float = -1.0, pv_shift: float = 1.0):
        """Reset with schedule tables (dict per generate_schedule_native or a
        core.DaySchedule).  batt_soc < 0 keeps the carried battery state."""
        if not isinstance(schedule, dict):
            schedule = {name: np.asarray(getattr(schedule, name), dtype=np.float64) for name in _SCHEDULE_FIELDS}
        tables = [np.ascontiguousarray(schedule[name], dtype=np.float64) for name in _SCHEDULE_FIELDS]
        self._lib.ng_engine_reset(
            self._h, *[_ptr(a) for a in tables],
            ctypes.c_double(batt_soc), ctypes.c_double(pv_shift), _ptr(self._obs),
        )
        return self._obs.copy()

    def step(self, actions):
        actions = np.ascontiguousarray(np.asarray(actions, dtype=np.float64))
        done = self._lib.ng_engine_step(
            self._h, _ptr(actions), _ptr(self._obs), _ptr(self._reward),
            _ptr(self._info), _ptr(self._powers),
        )
        info = dict(zip(INFO_FIELDS, self._info.tolist()))
        info["charger_power_values"] = self._powers.copy()
        return self._obs.copy(), float(self._reward[0]), bool(done), info

    def __del__(self):
        if getattr(self, "_h", None) and getattr(self, "_lib", None):
            self._lib.ng_engine_free(self._h)
            self._h = None


class NativeBatchEngine:
    """Fleet of independent native envs stepped in lockstep (OpenMP).

    The production-serving counterpart of :class:`NativeEngine`: B envs behind
    one ``step_batch`` call, parallelised across cores in C++ — no Python in
    the per-env loop.  Semantics are per-env identical to :class:`NativeEngine`
    (tests/test_native.py pins the batch against B individual engines)."""

    def __init__(self, config, num_envs: int):
        lib = _load()
        self.config = config
        self.num_envs = num_envs
        price, rad, solar = _build_tables(config)
        if config.lookahead >= config.steps_per_day:
            raise ValueError("lookahead must stay within the padded 2-day tables")
        self._h = lib.ng_batch_new(
            num_envs, config.num_chargers, config.time_interval,
            int(config.pv_system), int(config.battery_system),
            int(config.vehicle_to_everything), int(config.penalty_mode),
            int(config.lookahead),
            _ptr(price), len(price), _ptr(rad), _ptr(solar), len(solar),
        )
        self._keepalive = (price, rad, solar)
        self._lib = lib
        self.obs_dim = lib.ng_batch_obs_dim(self._h)
        self.num_actions = config.num_chargers + int(config.battery_system)
        B, N = num_envs, config.num_chargers
        self._obs = np.zeros((B, self.obs_dim), dtype=np.float64)
        self._rewards = np.zeros(B, dtype=np.float64)
        self._dones = np.zeros(B, dtype=np.float64)
        self._infos = np.zeros((B, 16), dtype=np.float64)
        self._powers = np.zeros((B, N), dtype=np.float64)

    def reset(self, schedules, batt_soc: float = -1.0, pv_shifts=None):
        """Reset every env with its own schedule (list of dicts per
        generate_schedule_native, or DaySchedule objects)."""
        if pv_shifts is None:
            pv_shifts = np.ones(self.num_envs)
        for i, schedule in enumerate(schedules):
            if not isinstance(schedule, dict):
                schedule = {name: np.asarray(getattr(schedule, name), dtype=np.float64)
                            for name in _SCHEDULE_FIELDS}
            tables = [np.ascontiguousarray(schedule[name], dtype=np.float64)
                      for name in _SCHEDULE_FIELDS]
            self._lib.ng_batch_reset_env(
                self._h, i, *[_ptr(a) for a in tables],
                ctypes.c_double(batt_soc), ctypes.c_double(float(pv_shifts[i])),
                _ptr(self._obs),
            )
        return self._obs.copy()

    def step_batch(self, actions):
        """Step all envs: actions (B, A) -> (obs (B, D), rewards (B,),
        dones (B,), infos dict of (B,) arrays + charger powers (B, N))."""
        actions = np.ascontiguousarray(np.asarray(actions, dtype=np.float64))
        assert actions.shape == (self.num_envs, self.num_actions), actions.shape
        self._lib.ng_batch_step(
            self._h, _ptr(actions), _ptr(self._obs), _ptr(self._rewards),
            _ptr(self._dones), _ptr(self._infos), _ptr(self._powers),
        )
        infos = {name: self._infos[:, k].copy() for k, name in enumerate(INFO_FIELDS)}
        infos["charger_power_values"] = self._powers.copy()
        return (self._obs.copy(), self._rewards.copy(),
                self._dones.astype(bool), infos)

    def __del__(self):
        if getattr(self, "_h", None) and getattr(self, "_lib", None):
            self._lib.ng_batch_free(self._h)
            self._h = None


def _build_tables(config):
    """price/rad/solar tables as contiguous f64, numpy-only (no JAX)."""
    from ..core import prices as prices_mod, solar as solar_mod

    price_table, _ = prices_mod.build_price_table(config.price_model, config.price_table_len)
    if config.pv_system:
        irr, solar_power, max_rad = solar_mod.build_solar_tables(
            config.time_interval, config.steps_per_day
        )
        rad_norm = irr / max_rad
    else:
        solar_power = np.zeros(config.solar_table_len)
        rad_norm = np.zeros(config.solar_table_len)
    return (np.ascontiguousarray(price_table, dtype=np.float64),
            np.ascontiguousarray(rad_norm, dtype=np.float64),
            np.ascontiguousarray(solar_power, dtype=np.float64))
