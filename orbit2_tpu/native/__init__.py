from orbit2_tpu.native.store import SampleStore, StoreDataLoader, build_library
