# -*- coding: utf-8 -*-
"""Headless equivalent of the reference's GUI quickstart
(reference: doc/source/quickstart.rst): fit the 3-population sphere mix
in quickstartdemo1.csv with a log-scaled post-fit histogram, write the
full output file set and a plot.

    python examples/quickstart.py path/to/quickstartdemo1.csv
"""
import sys
import time

import mcsas_tpu as mt
from mcsas_tpu.config import McSASConfig


def main(path):
    data = mt.load(path)
    print(f"loaded {data.title}: {data.count} fit points, "
          f"sphere-size estimate {tuple(round(x * 1e9, 2) for x in data.spherical_size_estimate)} nm")

    # "copy the sphere size estimates to the model" (quickstart step 2)
    bound = mt.get_model("Sphere").bind(
        active_ranges={"radius": data.spherical_size_estimate})

    # reference defaults: 300 contributions x 10 repetitions; the iteration
    # budget is larger here because each repetition runs to chi2<=1 in one
    # attempt instead of relying on retries
    cfg = McSASConfig(num_contribs=300, num_reps=10,
                      max_iterations=2_000_000, candidates_per_step=64,
                      chunk_steps=2048)

    # log-scaled histogram (quickstart step 3)
    hist = [mt.HistogramSpec("radius", xscale="log", bin_count=50)]

    t0 = time.perf_counter()
    result = mt.fit(data, model=bound, cfg=cfg, histograms=hist)
    print(f"optimization took {time.perf_counter() - t0:.2f} s "
          f"(reference quickstart: 36 s on a 2012 iMac); "
          f"chi2 = {result.engine.conval.round(3).tolist()}")

    files = mt.OutputFiles(result, out_dir=".").write_all(plot=True)
    print("wrote:", ", ".join(str(v) for v in files.values()))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "/root/reference/testdata/quickstartdemo1.csv")
