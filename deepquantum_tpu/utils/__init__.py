from .compat import to_device, to_numpy
from .io import load_params, load_train_state, save_params, save_train_state
from .timing import Time, record_time
