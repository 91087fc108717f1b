from . import analysis  # noqa: F401
from . import curation  # noqa: F401
from . import packing  # noqa: F401
from . import redact  # noqa: F401
from . import winnow  # noqa: F401
