from .cs import Column, ConstraintSystem, Gate, Lookup
from .expression import Advice, Challenge, Constant, Expression, Fixed, Instance
