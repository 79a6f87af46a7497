from .compat import to_device, to_numpy
from .timing import Time, record_time
