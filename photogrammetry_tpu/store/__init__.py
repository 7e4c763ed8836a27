from photogrammetry_tpu.store.content_store import ContentStore, Variant
from photogrammetry_tpu.store.cache import DistortionMapCache, KeypointCache
