"""Deterministic generator for operational_year.csv.

The reference production studies drive the cavern with hourly operational
pressure CSVs for whole storage years
(/root/reference/examples/mechanics/nobian/Simulation/run_interlayer.py:
396-763 reads `druk_mpa` columns and stretches/repeats them over the
horizon).  Those customer records are not redistributable, so this script
synthesizes a REALISTIC gas-storage year with the same structure and
commits it as data:

* a seasonal cycle: withdrawal through winter (falling pressure), injection
  through summer (rising), ~annual period;
* weekly trading swings (weekday draw / weekend refill);
* a handful of fast power-generation draw events (the reference's
  power-gen scenario family, run_interlayer.py:1011-1109) with steep ramps
  and recovery;
* band-limited operational noise, seeded for reproducibility.

Run:  python make_profile.py   (rewrites operational_year.csv in place)
"""
import os

import numpy as np

HOURS = 365 * 24
P_MIN, P_MAX = 6.0, 14.0      # MPa operating window


def main():
    rng = np.random.default_rng(42)
    h = np.arange(HOURS, dtype=float)

    # seasonal storage cycle: full near Nov 1 (hour 0 = Jan 1), minimum in
    # early spring, refilled over summer
    seasonal = 0.5 - 0.5 * np.cos(2 * np.pi * (h - 2200.0) / HOURS)

    # weekly trading cycle, stronger in winter
    weekly = 0.08 * np.sin(2 * np.pi * h / (7 * 24.0)) * (1.2 - seasonal)

    # power-generation draw events: steep 6 h draw, 48 h recovery
    events = np.zeros(HOURS)
    for start in rng.choice(HOURS - 100, size=10, replace=False):
        t = h - start
        draw = np.clip(t / 6.0, 0.0, 1.0) * np.exp(-np.clip(t, 0, None)
                                                   / 48.0)
        events -= 0.12 * np.where(t >= 0, draw, 0.0)

    # band-limited noise (ornstein-uhlenbeck walk, ~daily correlation)
    noise = np.zeros(HOURS)
    for i in range(1, HOURS):
        noise[i] = 0.96 * noise[i - 1] + 0.008 * rng.standard_normal()

    frac = np.clip(seasonal + weekly + events + noise, 0.0, 1.0)
    p_mpa = P_MIN + (P_MAX - P_MIN) * frac

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "operational_year.csv")
    with open(out, "w") as f:
        f.write("uur;druk_mpa\n")
        for i, p in enumerate(p_mpa):
            f.write(f"{i};{p:.3f}\n".replace(".", ","))
    print(f"wrote {out} ({HOURS} hourly rows, "
          f"{p_mpa.min():.2f}-{p_mpa.max():.2f} MPa)")


if __name__ == "__main__":
    main()
