from orbit2_tpu.data.itermodule import IterDataModule
from orbit2_tpu.data.reader import (
    NpyReader,
    Downscale,
    DirectForecast,
    ContinuousForecast,
    IndividualDataIter,
    ShuffleIterableDataset,
    tile_slices,
    tile_shapes,
    halo_lrtb,
)
from orbit2_tpu.data.transforms import LogTransform, Normalize
from orbit2_tpu.data.loader import BatchLoader, collate, collate_continuous, device_prefetch
from orbit2_tpu.data.climatebench import ClimateBenchDataModule, ClimateBenchDataset
from orbit2_tpu.data.mapmodule import ERA5toPRISMDataModule, NpzDataset
