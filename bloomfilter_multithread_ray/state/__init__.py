from .base import Sketch, deserialize_sketch  # noqa: F401
from .bloom import BloomFilter  # noqa: F401
from .hll import HyperLogLog  # noqa: F401
from .cms import CountMinSketch  # noqa: F401
from .tdigest import TDigest  # noqa: F401
from .kll import KLL  # noqa: F401
from .minhash import MinHash  # noqa: F401
from .simhash import simhash64  # noqa: F401
from .kmv import BottomKSample  # noqa: F401
from .misra_gries import MisraGries  # noqa: F401
from .countsketch import CountSketch  # noqa: F401
from .fd import FrequentDirections  # noqa: F401
from .counting_bloom import CountingBloom  # noqa: F401
from .cuckoo import CuckooFilter  # noqa: F401
from .bloom_blocked import BlockedBloomFilter  # noqa: F401
