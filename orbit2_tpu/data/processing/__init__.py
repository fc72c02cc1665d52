from orbit2_tpu.data.processing import era5_constants
