"""Import smoke tests + constructor instantiation for every nn module class
(mirror of the reference's `tests/test_imports.py`)."""


def test_import_top_level():
    import orion_tpu as orion
    for name in ("init_scheme", "delete_scheme", "encode", "decode",
                 "encrypt", "decrypt", "fit", "compile"):
        assert callable(getattr(orion, name))


def test_import_models():
    import orion_tpu.models as m
    for name in ("MLP", "LoLA", "LeNet", "AlexNet", "VGG11", "VGG13",
                 "VGG16", "VGG19", "ResNet20", "ResNet32", "ResNet44",
                 "ResNet56", "ResNet110", "ResNet18", "ResNet34",
                 "ResNet50", "ResNet101", "ResNet152", "YOLOv1_ResNet34"):
        assert hasattr(m, name)


def test_instantiate_nn_modules():
    import orion_tpu.nn as on
    modules = [
        on.Linear(8, 4),
        on.Conv2d(1, 2, 3),
        on.BatchNorm1d(4),
        on.BatchNorm2d(4),
        on.AvgPool2d(2),
        on.AdaptiveAvgPool2d((1, 1)),
        on.Flatten(),
        on.Identity(),
        on.Add(),
        on.Mult(),
        on.Quad(),
        on.Activation([0.0, 1.0, 0.5]),
        on.Chebyshev(7, lambda x: x),
        on.ELU(), on.Hardshrink(), on.GELU(), on.SiLU(), on.Sigmoid(),
        on.SELU(), on.Softplus(), on.Mish(),
        on.ReLU(),
        on.Bootstrap(-1.0, 1.0, 2),
        on.Sequential(on.Linear(4, 4), on.Quad()),
    ]
    for mod in modules:
        assert isinstance(mod, on.Module)


def test_instantiate_models_cleartext():
    import numpy as np
    import orion_tpu.models as m
    net = m.LeNet()
    net.eval()
    out = net(np.random.rand(1, 1, 28, 28).astype("float32"))
    assert out.shape == (1, 10)
