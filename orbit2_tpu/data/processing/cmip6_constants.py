"""CMIP6 variable naming/metadata tables (same facts as the reference's
cmip6_constants module — CMIP6 conventions, not code), spec-table form like
era5_constants."""

_SPEC = {
    "air_temperature": ("tas", "C", "s"),
    "geopotential": ("zg", "m^2/s^2", "p"),
    "u_component_of_wind": ("u", "m/s", "p"),
    "v_component_of_wind": ("v", "m/s", "p"),
    "temperature": ("ta", "C", "p"),
    "specific_humidity": ("hus", "kg/kg", "p"),
}

NAME_TO_VAR = {name: code for name, (code, _, _) in _SPEC.items()}
VAR_TO_NAME = {code: name for name, code in NAME_TO_VAR.items()}
VAR_TO_UNIT = {name: unit for name, (_, unit, _) in _SPEC.items()}
SINGLE_LEVEL_VARS = [n for n, (_, _, kind) in _SPEC.items() if kind == "s"]
PRESSURE_LEVEL_VARS = [n for n, (_, _, kind) in _SPEC.items() if kind == "p"]

DEFAULT_PRESSURE_LEVELS = [50, 250, 500, 600, 700, 850, 925]
CONSTANTS = []

NAME_LEVEL_TO_VAR_LEVEL = {n: NAME_TO_VAR[n] for n in SINGLE_LEVEL_VARS}
for _var in PRESSURE_LEVEL_VARS:
    for _l in DEFAULT_PRESSURE_LEVELS:
        NAME_LEVEL_TO_VAR_LEVEL[f"{_var}_{_l}"] = f"{NAME_TO_VAR[_var]}_{_l}"
VAR_LEVEL_TO_NAME_LEVEL = {v: k for k, v in NAME_LEVEL_TO_VAR_LEVEL.items()}
