from .portable_hash import md5_hash64, md5_hash_str  # noqa: F401
from .predicates import interval_overlaps  # noqa: F401
from .timeparse import (  # noqa: F401
    TIMEMARK_RE,
    timemark_from_filename,
    timemark_iso_z,
)
from .strings import sanitize_pivot_label  # noqa: F401
