"""Registration orchestration: multi-resolution pyramid driver, convergence
control, and the stateful session API (the reference's L3/L4 layers,
``src/ImageRegistration*.cpp`` and ``WrapperOpticalFlow2d.cpp``, rebuilt as
pure functions under jit)."""
