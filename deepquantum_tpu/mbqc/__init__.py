from .command import Command, Correction, Entanglement, Measurement, Node
from .pattern import Pattern
from .state import GraphState, SubGraphState
from .templates import MBQC_TEMPLATES
