"""Discovery sources: path-template expansion and catalog construction.

The reference's engine plugins (S3/GEE/STAC ``scan``, SURVEY §2.1/2.10)
reduce to: expand a path template over time × grid-cell variables,
list matching files, parse dates back out of paths, persist a catalog.
Here the listing side is the local filesystem / parquet dataset and the
catalog is Parquet with typed nested columns instead of stringly CSV.
"""

# import for side-effect: registers the "stac_json" engine
from edkray.sources import stac_json as _stac_json  # noqa: F401

# import for side-effect: registers the "pushdown_parquet" engine
from edkray.sources import pushdown as _pushdown  # noqa: F401

# import for side-effect: registers the "warclike" record-container engine
from edkray.sources import warclike as _warclike  # noqa: F401

# import for side-effect: registers the "jsonl" web-corpus engine
from edkray.sources import jsonl as _jsonl  # noqa: F401
