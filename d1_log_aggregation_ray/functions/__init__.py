from .hashing import md5_lower64, md5_lower64_array, hash32_array, epoch_us
from .geohash import geohash_encode

__all__ = ["md5_lower64", "md5_lower64_array", "hash32_array", "geohash_encode", "epoch_us"]
