from . import apply, gates, qmath
