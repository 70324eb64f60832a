from .filters import BloomFilter, CuckooFilter
from .politeness import TokenBucket, HostPoliteness, RobotsCache

__all__ = ["BloomFilter", "CuckooFilter", "TokenBucket", "HostPoliteness", "RobotsCache"]
