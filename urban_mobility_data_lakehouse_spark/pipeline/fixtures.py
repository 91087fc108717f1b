"""Deterministic reference-shaped fixture generator (FIXTURES.md §A).

Writes the bronze-source CSVs the mobility pipeline ingests, with every
characteristic dirty-data case the reference's cleaning operators exist
for: embedded header rows, 'NA' literals, Spanish decimal formats,
float-formatted integers (the "Zero Trap"), trailing-whitespace codes,
invalid dates, external zone codes, BOM column prefixes, holiday-wording
variants, off-year holiday dates.

Pure Python + fixed arithmetic (no RNG) → byte-stable across runs.
"""

from __future__ import annotations

import os

N_ZONES = 12
ZONE_CODES = [f"010{i:02d}" for i in range(1, N_ZONES + 1)]
EXTERNAL_CODE = "PT170"  # present in trips, absent from dims (inner-join loss)

# 2023-10-16 … 2023-11-05: 21 days spanning the Europe/Madrid DST
# fall-back (Sun 2023-10-29) and All Saints (Wed 2023-11-01 holiday).
DATES = [
    f"202310{d:02d}" for d in range(16, 32)
] + [f"202311{d:02d}" for d in range(1, 6)]
HOLIDAYS = {"20231101"}


def _dow(date: str) -> int:
    """Day of week, Monday=0 (2023-10-16 was a Monday)."""
    import datetime

    return datetime.date(int(date[:4]), int(date[4:6]), int(date[6:])).weekday()


def day_type(date: str) -> str:
    if date in HOLIDAYS or _dow(date) == 6:
        return "sunday_holiday"
    if _dow(date) == 5:
        return "saturday"
    return "weekday"


def hourly_volume(date: str, hour: int, o: int, d: int) -> float:
    """Three separable daily profiles (FIXTURES.md A8: K-Means must
    recover weekday / saturday / sunday+holiday)."""
    kind = day_type(date)
    if kind == "weekday":
        base = 40 + 300 * (hour in (7, 8, 9)) + 260 * (hour in (17, 18, 19))
    elif kind == "saturday":
        base = 70 + 180 * (11 <= hour <= 16)
    else:
        base = 20 + 120 * (19 <= hour <= 21)
    # small deterministic per-OD variation (≤ ~8% of base, so the three
    # profile shapes stay cleanly separable for K-Means)
    jitter = ((o * 7 + d * 13 + hour * 3 + int(date) % 97) % 7) - 3
    return float(max(1, base + jitter))


def write_fixtures(root: str) -> dict[str, str]:
    """Writes all bronze CSVs under `root`; returns name→path."""
    os.makedirs(root, exist_ok=True)
    paths: dict[str, str] = {}

    # A2 zoning (pipe-separated, embedded header row mid-data)
    lines = ["ID|name"]
    for i, code in enumerate(ZONE_CODES):
        pad = " " if i % 5 == 0 else ""  # trailing whitespace case
        lines.append(f"{code}{pad}|Zone {code}")
        if i == 6:
            lines.append("ID|name")  # embedded header (filter z.ID != 'ID')
    paths["zoning"] = _write(root, "zoning_municipalities.csv", lines)

    # A3 population (headerless; garbage + Zero Trap rows)
    lines = []
    for i, code in enumerate(ZONE_CODES):
        pop = 10_000 + i * 5_000
        val = f"{pop}.0" if i % 4 == 0 else str(pop)  # "50.0" Zero Trap
        lines.append(f"{code},{val}")
    lines += ["total,habitantes", "99999,NA", "98999,"]
    paths["population"] = _write(
        root, "population_municipalities.csv", lines
    )

    # A4 INE↔MITMA mapping (many INE per MITMA → MIN dedup; NA rows)
    lines = [
        "seccion_ine,distrito_ine,municipio_ine,distrito_mitma,municipio_mitma"
    ]
    for i, code in enumerate(ZONE_CODES):
        ine = f"48{i:03d}"
        lines.append(f"{ine}01,{ine}1,{ine},{code}1,{code}")
        if i % 3 == 0:  # second INE code for the same MITMA (dedup case)
            lines.append(f"49{i:03d}01,49{i:03d}1,49{i:03d},{code}1,{code}")
    lines.append("NA,NA,NA,NA1,NA")
    paths["mapping"] = _write(root, "mapping_ine_mitma.csv", lines)

    # A5 INE rent (code+name column, Spanish thousands format, noise rows)
    lines = [
        "﻿Municipios;Distritos;Secciones;Indicadores de renta media;Periodo;Total"
    ]
    for i, code in enumerate(ZONE_CODES):
        ine = f"48{i:03d}"
        rent = 11 + (i % 5)
        lines.append(
            f"{ine} Zone {code};;;Renta neta media por persona;2023;{rent}.500"
        )
        # non-target indicator row (must be filtered out)
        lines.append(
            f"{ine} Zone {code};;;Renta neta media por hogar;2023;25.000"
        )
    # district-level + unparseable rows
    lines.append("4800001 Distrito 1;D1;;Renta neta media por persona;2023;12.000")
    lines.append(f"48000 Zone X;;;Renta neta media por persona;2023;.")
    paths["rent"] = _write(root, "ine_rent_municipalities.csv", lines)

    # A6 work calendar (DD/MM/YYYY; wording variants; off-year; dupes)
    lines = ["Dia;Tipo de Festivo"]
    lines.append("01/11/2023;Festivo nacional")
    lines.append("01/11/2023;festivo NACIONAL")  # duplicate, case variant
    lines.append("25/12/2023;Fiesta nacional")  # outside fact window
    lines.append("01/11/2022;Festivo nacional")  # wrong year → MAKE_DATE shift
    lines.append("15/08/2023;Festivo local")  # non-national (ILIKE miss)
    paths["calendar"] = _write(root, "work_calendars.csv", lines)

    # A7 geo (WKT squares on a grid; one NULL geometry)
    lines = ["id,wkt_polygon"]
    for i, code in enumerate(ZONE_CODES):
        if i == N_ZONES - 1:
            lines.append(f"{code},")  # missing geometry (audit case)
            continue
        lon0 = -8.0 + (i % 4) * 1.0
        lat0 = 37.0 + (i // 4) * 1.0
        ring = (
            f"{lon0} {lat0}, {lon0 + 0.5} {lat0}, "
            f"{lon0 + 0.5} {lat0 + 0.5}, {lon0} {lat0 + 0.5}, {lon0} {lat0}"
        )
        lines.append(f'{code},"POLYGON(({ring}))"')
    paths["geo"] = _write(root, "geo_municipalities.csv", lines)

    # A1 daily OD trips — one CSV per date (the per-day gz layout)
    trips_dir = os.path.join(root, "trips")
    os.makedirs(trips_dir, exist_ok=True)
    header = (
        "fecha,periodo,origen,destino,distancia,actividad_origen,"
        "actividad_destino,residencia,renta,edad,sexo,viajes,viajes_km"
    )
    for date in DATES:
        lines = [header]
        for o, ocode in enumerate(ZONE_CODES):
            for d, dcode in enumerate(ZONE_CODES):
                if (o + d) % 3 == 2:
                    continue  # sparse OD matrix
                for hour in range(24):
                    v = hourly_volume(date, hour, o, d)
                    if (o * 31 + d * 17 + hour) % 50 == 0:
                        viajes = f'"{v:,.2f}"'.replace(",", "_").replace(
                            ".", ","
                        ).replace("_", ".")  # Spanish "1.234,50" format
                    else:
                        viajes = f"{v:.2f}"
                    ocode_out = ocode + ("  " if (o + hour) % 11 == 0 else "")
                    lines.append(
                        f"{date},{hour:02d},{ocode_out},{dcode},0.5-2,casa,"
                        f"trabajo,ES,10-15,25-45,M,{viajes},{v * 3:.2f}"
                    )
        # dirty rows: external zone, NULL fecha, invalid date
        lines.append(
            f"{date},08,{EXTERNAL_CODE},{ZONE_CODES[0]},2-10,casa,trabajo,"
            f"PT,10-15,25-45,F,5.00,15.00"
        )
        lines.append(
            f",09,{ZONE_CODES[0]},{ZONE_CODES[1]},0.5-2,casa,trabajo,ES,"
            f"10-15,25-45,M,3.00,9.00"
        )
        lines.append(
            f"20231035,10,{ZONE_CODES[1]},{ZONE_CODES[2]},0.5-2,casa,"
            f"trabajo,ES,10-15,25-45,F,2.00,6.00"
        )
        _write(trips_dir, f"{date}_Viajes_municipios.csv", lines)
    paths["trips_dir"] = trips_dir
    return paths


def _write(root: str, name: str, lines: list[str]) -> str:
    path = os.path.join(root, name)
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    return path
