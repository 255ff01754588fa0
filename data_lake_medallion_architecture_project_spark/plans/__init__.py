from .registry import REGISTRY, Query, register  # noqa: F401

# Importing the plan modules populates REGISTRY via their @register decorators.
from . import medallion  # noqa: F401,E402
from . import analytics  # noqa: F401,E402
from . import extensions  # noqa: F401,E402
from . import temporal  # noqa: F401,E402
from . import sqlops  # noqa: F401,E402
from . import advanced  # noqa: F401,E402
from . import tpch2  # noqa: F401,E402
from . import training  # noqa: F401,E402
