"""Query registry — the driver contract's implementation (package form).

Split from the former single-file registry.py in round 11 (it had grown to
~9.9k lines); the split is MECHANICAL — same queries, same oracles, same
registration order (module import order below == the original file order,
which `__spark_entry__._driver_order` depends on for its registration
index). Engine-portability conventions live in `_core`'s docstring.
"""

from ._core import (  # noqa: F401
    LATE_ADDITIONS,
    ORACLES,
    QUERIES,
    QueryFn,
    _register,
)

# registration order == original monolith order — do not reorder
from . import q_flink_core  # noqa: F401,E402
from . import q_tpch  # noqa: F401,E402
from . import q_northstar  # noqa: F401,E402
from . import q_olap_mix  # noqa: F401,E402
from . import q_curation_mm  # noqa: F401,E402
from . import q_round5_7  # noqa: F401,E402
from . import q_round8_9a  # noqa: F401,E402
from . import q_round9b_10  # noqa: F401,E402
