#!/usr/bin/env python
"""Materialize the synthesized stand-ins for the reference's missing data
files (SURVEY.md §2.3) as netCDF files:

    python tools/make_fixtures.py [outdir]   # default: ./data

Writes PV.nc, internalwave.nc, globalTracers.nc with the schemas the
reference workloads cite.  (The files are generated deterministically from
utils/synth.py; they are not committed as binary blobs.)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xcontour_tpu.utils import synth
from xcontour_tpu.utils.ncio import save_dataset


def main(outdir: str = "data"):
    os.makedirs(outdir, exist_ok=True)

    v, dims = synth.synth_pv()
    save_dataset(os.path.join(outdir, "PV.nc"), v, dims,
                 coords={k: v[k] for k in ("level", "latitude", "longitude")})

    v, dims = synth.synth_internalwave()
    save_dataset(os.path.join(outdir, "internalwave.nc"), v, dims,
                 coords={k: v[k] for k in ("time", "Z", "XC")})

    v, dims = synth.synth_global_tracers()
    save_dataset(os.path.join(outdir, "globalTracers.nc"), v, dims,
                 coords={k: v[k] for k in ("time", "YC", "XC")})
    print(f"wrote PV.nc, internalwave.nc, globalTracers.nc to {outdir}/")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "data")
