"""ERA5 variable naming tables (reference
src/climate_learn/data/processing/era5_constants.py:1-103)."""

NAME_TO_VAR = {
    "2m_temperature": "t2m",
    "2m_temperature_min": "t2m_min",
    "2m_temperature_max": "t2m_max",
    "10m_u_component_of_wind": "u10",
    "10m_v_component_of_wind": "v10",
    "mean_sea_level_pressure": "msl",
    "surface_pressure": "sp",
    "toa_incident_solar_radiation": "tisr",
    "total_precipitation_24hr": "tp",
    "land_sea_mask": "lsm",
    "orography": "orography",
    "lattitude": "lat2d",
    "geopotential": "z",
    "u_component_of_wind": "u",
    "v_component_of_wind": "v",
    "temperature": "t",
    "relative_humidity": "r",
    "specific_humidity": "q",
    "vorticity": "vo",
    "potential_vorticity": "pv",
    "total_cloud_cover": "tcc",
}

VAR_TO_NAME = {v: k for k, v in NAME_TO_VAR.items()}

SINGLE_LEVEL_VARS = [
    "2m_temperature",
    "2m_temperature_min",
    "2m_temperature_max",
    "10m_u_component_of_wind",
    "10m_v_component_of_wind",
    "mean_sea_level_pressure",
    "surface_pressure",
    "toa_incident_solar_radiation",
    "total_precipitation_24hr",
    "total_cloud_cover",
    "land_sea_mask",
    "orography",
    "lattitude",
]

PRESSURE_LEVEL_VARS = [
    "geopotential",
    "u_component_of_wind",
    "v_component_of_wind",
    "temperature",
    "relative_humidity",
    "specific_humidity",
    "vorticity",
    "potential_vorticity",
]

VAR_TO_UNIT = {
    "2m_temperature": "K",
    "2m_temperature_min": "K",
    "2m_temperature_max": "K",
    "10m_u_component_of_wind": "m/s",
    "10m_v_component_of_wind": "m/s",
    "mean_sea_level_pressure": "Pa",
    "surface_pressure": "Pa",
    "toa_incident_solar_radiation": "J/m^2",
    "total_precipitation_24hr": "m",
    "total_cloud_cover": None,
    "land_sea_mask": None,
    "orography": None,
    "geopotential": "m^2/s^2",
    "u_component_of_wind": "m/s",
    "v_component_of_wind": "m/s",
    "temperature": "K",
    "relative_humidity": "%",
    "specific_humidity": "kg/kg",
    "vorticity": "1/s",
    "potential_vorticity": "K m^2 / (kg s)",
}

PRECIP_VARIABLES = ["total_precipitation_24hr"]

DEFAULT_PRESSURE_LEVELS = [50, 250, 500, 600, 700, 850, 925]

SR_PRESSURE_LEVELS = [500, 850]

# channels whose predictions are replaced by ground truth in
# clip_replace_constant (reference intermediate_downscaling.py:267-278)
CONSTANTS = ["orography", "land_sea_mask", "slt", "lattitude", "longitude"]

NAME_LEVEL_TO_VAR_LEVEL = {}
for _var in SINGLE_LEVEL_VARS:
    NAME_LEVEL_TO_VAR_LEVEL[_var] = NAME_TO_VAR[_var]
for _var in PRESSURE_LEVEL_VARS:
    for _l in DEFAULT_PRESSURE_LEVELS:
        NAME_LEVEL_TO_VAR_LEVEL[f"{_var}_{_l}"] = f"{NAME_TO_VAR[_var]}_{_l}"

VAR_LEVEL_TO_NAME_LEVEL = {v: k for k, v in NAME_LEVEL_TO_VAR_LEVEL.items()}
