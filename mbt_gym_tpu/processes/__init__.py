from mbt_gym_tpu.processes.arrivals import HawkesArrivals, PoissonArrivals, PoissonArrivalsNonLinear
from mbt_gym_tpu.processes.base import ProcessBase
from mbt_gym_tpu.processes.fills import ExogenousMmFill, ExponentialFill, PowerFill, TriangularFill
from mbt_gym_tpu.processes.impact import (
    TemporaryAndPermanentImpact,
    TemporaryAndTransientImpact,
    TemporaryPowerImpact,
    TransientImpact,
)
from mbt_gym_tpu.processes.midprice import (
    BrownianMotionJumpMidprice,
    BrownianMotionMidprice,
    CevMidprice,
    ConstantMidprice,
    GeometricBrownianMotionMidprice,
    HestonMidprice,
    OuJumpMidprice,
    OuMidprice,
    ShortTermJumpAlphaMidprice,
    ShortTermOuAlphaMidprice,
)
