"""Telemetry visualisation — the counterpart of the reference's plotly notebooks.

The reference inspects episodes through two notebooks
(predictions_visualisation.ipynb, to_be_model_visualisation.ipynb) that read
the ``*-prediction_results.json`` / ``*-initial_values.json`` files the env
dumps and chart essentially every series.  This CLI renders the full coverage
from those files — ours or the reference's, the keys match:

- per-charger SoC with requested-SoC overlays and arrival/departure markers
  (the notebooks' per-vehicle tables, from ``--initial-values``),
- per-charger actions and power values (``Charger_actions``,
  ``Charger_power_values``),
- aggregate powers, battery action/power/SoC, available vs utilized solar,
- the complete penalty breakdown (all 8 sub-penalty series the env records,
  envs/smart_nanogrid_environment.py:246-275) and costs.

Run:  python -m smart_nanogrid_gym_tpu.tools.visualize \\
          --results out/RL/single_prediction_files/prediction_results.json \\
          [--initial-values out/.../initial_values.json] [--out day.png]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def load_results(path: str) -> dict:
    with open(path) as fp:
        return json.load(fp)


def _series(results: dict, key: str):
    v = results.get(key)
    return None if v is None else np.asarray(v)


def _plot_keyed(ax, results, pairs, title, ylabel=""):
    for key, label in pairs:
        s = _series(results, key)
        if s is not None and s.size:
            ax.plot(s, label=label, lw=1.2)
    ax.legend(fontsize=7)
    ax.set_title(title, fontsize=9)
    ax.set_xlabel("timestep", fontsize=8)
    if ylabel:
        ax.set_ylabel(ylabel, fontsize=8)
    ax.tick_params(labelsize=7)
    ax.grid(True, alpha=0.3)


def plot_results(results: dict, out_path: str, title: str = "",
                 initial_values: dict | None = None) -> str:
    """Render the full 28-series telemetry of one episode to a single PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    soc = _series(results, "SOC")
    T = len(results.get("Total_cost", [])) or (soc.shape[1] if soc is not None else 24)
    N = soc.shape[0] if soc is not None else 0

    fig, axes = plt.subplots(3, 3, figsize=(19, 12), constrained_layout=True)

    # --- (0,0) per-charger SoC + requested-SoC overlays + arrival/departure ---
    ax = axes[0][0]
    colors = plt.cm.tab10.colors
    if soc is not None:
        for c in range(N):
            ax.plot(soc[c, :T], label=f"charger {c}", lw=1.2, color=colors[c % 10])
    if initial_values:
        req = np.asarray(initial_values.get("Requested_SOC", []))
        arr = initial_values.get("Arrivals", [])
        dep = initial_values.get("Departures", [])
        if req.size:
            for c in range(min(N, req.shape[0])):
                nz = req[c, :T] > 0
                if nz.any():
                    ax.plot(np.where(nz, req[c, :T], np.nan), ls="--", lw=0.9,
                            color=colors[c % 10], alpha=0.7)
        for c in range(min(N, len(arr))):
            for a in arr[c]:
                if a < T:
                    ax.axvline(a, color=colors[c % 10], lw=0.5, alpha=0.35)
            for d in dep[c] if c < len(dep) else []:
                if d < T:
                    ax.axvline(d, color=colors[c % 10], lw=0.5, alpha=0.35, ls=":")
    ax.legend(fontsize=7)
    ax.set_title("Vehicle SoC (dashed: requested; |: arrival, ⋮: departure)", fontsize=9)
    ax.set_xlabel("timestep", fontsize=8)
    ax.grid(True, alpha=0.3)

    # --- (0,1) per-charger actions + battery action ---
    ax = axes[0][1]
    acts = _series(results, "Charger_actions")
    if acts is not None and acts.size:
        for c in range(acts.shape[1]):
            ax.step(range(len(acts)), acts[:, c], label=f"charger {c}",
                    lw=1.0, where="post", color=colors[c % 10])
    b_act = _series(results, "Battery_action")
    if b_act is not None and b_act.size:
        ax.step(range(len(b_act)), b_act, label="battery", lw=1.2, where="post",
                color="k", ls="--")
    ax.legend(fontsize=7)
    ax.set_title("Actions", fontsize=9)
    ax.set_xlabel("timestep", fontsize=8)
    ax.grid(True, alpha=0.3)

    # --- (0,2) per-charger power values ---
    ax = axes[0][2]
    powers = _series(results, "Charger_power_values")
    if powers is not None and powers.size:
        for c in range(powers.shape[1]):
            ax.plot(powers[:, c], label=f"charger {c}", lw=1.0, color=colors[c % 10])
    ax.legend(fontsize=7)
    ax.set_title("Per-charger power [kW]", fontsize=9)
    ax.set_xlabel("timestep", fontsize=8)
    ax.grid(True, alpha=0.3)

    # --- (1,0) aggregate powers ---
    _plot_keyed(axes[1][0], results, [
        ("Total_charging_power", "charging"),
        ("Total_discharging_power", "discharging"),
        ("Grid_power", "grid"),
        ("Battery_power_value", "battery"),
        ("Battery_calculated_power_value", "battery (pre-clamp)"),
    ], "Aggregate powers [kW]")

    # --- (1,1) solar: available (2-day trace) vs utilized ---
    ax = axes[1][1]
    avail = _series(results, "Available_solar_energy")
    if avail is not None and avail.size:
        ax.plot(avail.reshape(-1)[:T], label="available", lw=1.2)
    used = _series(results, "Utilized_solar_energy")
    if used is not None and used.size:
        ax.plot(used, label="utilized", lw=1.2)
    ax.legend(fontsize=7)
    ax.set_title("Solar energy [kWh]", fontsize=9)
    ax.set_xlabel("timestep", fontsize=8)
    ax.grid(True, alpha=0.3)

    # --- (1,2) BESS state ---
    ax = axes[1][2]
    bsoc = _series(results, "Battery_state_of_charge")
    if bsoc is not None and bsoc.size:
        ax.plot(bsoc, label="BESS SoC", lw=1.4, color="tab:green")
        init = results.get("Initial_battery_state_of_charge")
        if init is not None:
            ax.axhline(float(np.asarray(init)), color="tab:green", ls=":",
                       lw=0.9, label="initial SoC")
    ax.legend(fontsize=7)
    ax.set_title("Battery state of charge", fontsize=9)
    ax.set_xlabel("timestep", fontsize=8)
    ax.grid(True, alpha=0.3)

    # --- (2,0) vehicle penalty breakdown (incl. telemetry-only series) ---
    _plot_keyed(axes[2][0], results, [
        ("Total_vehicle_penalties", "total vehicle"),
        ("Insufficiently_charged_vehicle_penalties", "insufficient"),
        ("Needlessly_charged_vehicle_penalties", "needless"),
        ("Overcharged_vehicle_penalties", "overcharged"),
        ("Over_discharged_vehicle_penalties", "over-discharged"),
        ("DisCharging_nonexistent_vehicles_penalties", "nonexistent (marker)"),
    ], "Vehicle penalties")

    # --- (2,1) battery/nanogrid penalty breakdown ---
    _plot_keyed(axes[2][1], results, [
        ("Total_battery_penalties", "total battery"),
        ("Battery_SOC_below_DoD_penalties", "DoD"),
        ("Battery_overcharging_penalties", "overcharge"),
        ("Battery_over_discharging_penalties", "over-discharge"),
        ("Low_resource_utilisation_penalties", "low utilisation"),
        ("Total_penalties", "total (weighted)"),
    ], "Battery / nanogrid penalties")

    # --- (2,2) costs ---
    _plot_keyed(axes[2][2], results, [
        ("Total_cost", "total cost"),
        ("Grid_energy_cost", "grid energy cost"),
        ("Grid_energy", "grid energy [kWh]"),
    ], "Costs")

    if title:
        fig.suptitle(title)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--results", required=True, help="prediction_results.json path")
    p.add_argument("--initial-values", default=None,
                   help="matching initial_values.json (adds requested-SoC "
                        "overlays + arrival/departure markers)")
    p.add_argument("--out", default="prediction_results.png")
    p.add_argument("--title", default="")
    args = p.parse_args(argv)
    iv = load_results(args.initial_values) if args.initial_values else None
    path = plot_results(load_results(args.results), args.out, args.title,
                        initial_values=iv)
    print(json.dumps({"figure": path}))
    return path


if __name__ == "__main__":
    main()
