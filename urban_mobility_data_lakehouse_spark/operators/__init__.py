from . import relational  # noqa: F401
from . import sketches  # noqa: F401
from . import temporal  # noqa: F401
