from .compat import to_device, to_numpy
from .io import load_params, save_params
from .timing import Time, record_time
