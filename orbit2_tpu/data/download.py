"""Dataset download CLI (reference data/download.py:14-155).

Sources: Copernicus ERA5 (cdsapi), WeatherBench, MPI-ESM1-2-HR (CMIP6),
PRISM FTP. All need network + extra deps (cdsapi) not present on TPU pods —
each function gates its imports and raises a clear error offline.
"""

from __future__ import annotations

import argparse
import os

from orbit2_tpu.data.processing.era5_constants import NAME_TO_VAR


def download_copernicus_era5(root, variable, year, pressure=False, api_key=None):
    """reference download.py:14-63."""
    try:
        import cdsapi
    except ImportError as e:  # pragma: no cover
        raise ImportError("cdsapi is required: pip install cdsapi (offline env)") from e
    path = os.path.join(root, variable)
    os.makedirs(path, exist_ok=True)
    client = cdsapi.Client() if api_key is None else cdsapi.Client(key=api_key)
    request = {
        "product_type": "reanalysis",
        "format": "netcdf",
        "variable": variable,
        "year": str(year),
        "month": [f"{m:02d}" for m in range(1, 13)],
        "day": [f"{d:02d}" for d in range(1, 32)],
        "time": [f"{h:02d}:00" for h in range(24)],
    }
    dataset = "reanalysis-era5-single-levels"
    if pressure:
        dataset = "reanalysis-era5-pressure-levels"
        request["pressure_level"] = ["50", "250", "500", "600", "700", "850", "925"]
    client.retrieve(dataset, request, os.path.join(path, f"{variable}_{year}.nc"))


def download_weatherbench(root, dataset, variable, resolution=5.625):
    """reference download.py:66-100 (TU Munich WeatherBench mirror)."""
    import urllib.request

    path = os.path.join(root, variable)
    os.makedirs(path, exist_ok=True)
    if dataset == "era5":
        url = (
            "https://dataserv.ub.tum.de/s/m1524895/download?path=%2F"
            f"{resolution}deg%2F{variable}&files={variable}_{resolution}deg.zip"
        )
    elif dataset == "cmip6":
        url = (
            "https://dataserv.ub.tum.de/s/m1524895/download?path=%2FCMIP%2FMPI-ESM%2F"
            f"{resolution}deg%2F{variable}&files={variable}_{resolution}deg.zip"
        )
    else:
        raise ValueError(f"unknown weatherbench dataset {dataset}")
    urllib.request.urlretrieve(url, os.path.join(path, f"{variable}.zip"))


def download_prism(root, year, variable="ppt"):
    """PRISM daily .bil bundles (reference download.py:90-104): walk the
    year's FTP directory, fetch every zip, extract each into a
    YYYYMMDD-named subdirectory for prism.py to regrid."""
    import re
    from ftplib import FTP
    from zipfile import ZipFile

    os.makedirs(root, exist_ok=True)
    ftp = FTP("prism.oregonstate.edu")
    ftp.login()
    ftp.cwd(f"/daily/{variable}/{year}")
    for remote_fn in ftp.nlst():
        # skip non-zip listing entries (subdirs, checksums) before fetching
        date = re.search(r"\d{8}", remote_fn)
        if not (date and remote_fn.endswith(".zip")):
            continue
        local_fn = os.path.join(root, remote_fn)
        with open(local_fn, "wb") as f:
            ftp.retrbinary(f"RETR {remote_fn}", f.write)
        subdir = os.path.join(root, date[0])
        os.makedirs(subdir, exist_ok=True)
        with ZipFile(local_fn) as z:
            z.extractall(path=subdir)
        os.unlink(local_fn)  # reference deletes the archive after extraction
    ftp.quit()


def main():  # pragma: no cover
    parser = argparse.ArgumentParser(description="orbit2-tpu dataset downloader")
    sub = parser.add_subparsers(dest="source", required=True)

    p = sub.add_parser("copernicus")
    p.add_argument("--root", required=True)
    p.add_argument("--variable", required=True, choices=list(NAME_TO_VAR))
    p.add_argument("--year", type=int, required=True)
    p.add_argument("--pressure", action="store_true")
    p.add_argument("--api_key")

    p = sub.add_parser("weatherbench")
    p.add_argument("--root", required=True)
    p.add_argument("--dataset", required=True, choices=["era5", "cmip6"])
    p.add_argument("--variable", required=True)
    p.add_argument("--resolution", type=float, default=5.625)

    p = sub.add_parser("prism")
    p.add_argument("--root", required=True)
    p.add_argument("--year", type=int, required=True)
    p.add_argument("--variable", default="ppt")

    args = parser.parse_args()
    if args.source == "copernicus":
        download_copernicus_era5(args.root, args.variable, args.year,
                                 args.pressure, args.api_key)
    elif args.source == "weatherbench":
        download_weatherbench(args.root, args.dataset, args.variable,
                              args.resolution)
    elif args.source == "prism":
        download_prism(args.root, args.year, args.variable)


if __name__ == "__main__":  # pragma: no cover
    main()
