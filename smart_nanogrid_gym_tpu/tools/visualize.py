"""Telemetry visualisation — the counterpart of the reference's plotly notebooks.

The reference inspects episodes through two notebooks
(predictions_visualisation.ipynb, to_be_model_visualisation.ipynb) that read the
``*-prediction_results.json`` / ``*-initial_values.json`` files the env dumps.
This CLI renders the same series (per-charger SoC, powers, penalties, costs per
timestep) from those files — ours or the reference's, the keys match — to a
single PNG.

Run:  python -m smart_nanogrid_gym_tpu.tools.visualize \\
          --results out/RL/single_prediction_files/prediction_results.json
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def load_results(path: str) -> dict:
    with open(path) as fp:
        return json.load(fp)


def plot_results(results: dict, out_path: str, title: str = "") -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    soc = np.asarray(results.get("SOC", []))
    fig, axes = plt.subplots(2, 2, figsize=(13, 8), constrained_layout=True)

    ax = axes[0][0]
    if soc.size:
        T = len(results.get("Total_cost", [])) or soc.shape[1]
        for c in range(soc.shape[0]):
            ax.plot(soc[c, :T], label=f"charger {c}", lw=1.2)
        ax.legend(fontsize=7)
    ax.set_title("Vehicle state of charge")
    ax.set_xlabel("timestep")

    ax = axes[0][1]
    for key, label in [("Total_charging_power", "charging"),
                       ("Total_discharging_power", "discharging"),
                       ("Grid_power", "grid"),
                       ("Battery_power_value", "battery")]:
        series = results.get(key)
        if series:
            ax.plot(series, label=label, lw=1.2)
    solar = results.get("Utilized_solar_energy")
    if solar:
        ax.plot(solar, label="solar", lw=1.2)
    ax.legend(fontsize=7)
    ax.set_title("Powers [kW]")
    ax.set_xlabel("timestep")

    ax = axes[1][0]
    for key, label in [("Total_penalties", "total"),
                       ("Total_vehicle_penalties", "vehicle"),
                       ("Total_battery_penalties", "battery")]:
        series = results.get(key)
        if series:
            ax.plot(series, label=label, lw=1.2)
    ax.legend(fontsize=7)
    ax.set_title("Penalties")
    ax.set_xlabel("timestep")

    ax = axes[1][1]
    for key, label in [("Total_cost", "total cost"),
                       ("Grid_energy_cost", "grid energy cost")]:
        series = results.get(key)
        if series:
            ax.plot(series, label=label, lw=1.2)
    bsoc = results.get("Battery_state_of_charge")
    if bsoc:
        ax2 = ax.twinx()
        ax2.plot(bsoc, color="tab:green", ls="--", lw=1.0, label="BESS SoC")
        ax2.set_ylabel("BESS SoC")
    ax.legend(fontsize=7)
    ax.set_title("Costs")
    ax.set_xlabel("timestep")

    if title:
        fig.suptitle(title)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--results", required=True, help="prediction_results.json path")
    p.add_argument("--out", default="prediction_results.png")
    p.add_argument("--title", default="")
    args = p.parse_args(argv)
    path = plot_results(load_results(args.results), args.out, args.title)
    print(json.dumps({"figure": path}))
    return path


if __name__ == "__main__":
    main()
