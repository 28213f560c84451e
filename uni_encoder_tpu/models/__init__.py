from ..utils.registry import Registry

BACKBONES = Registry("backbones")
PIXEL_DECODERS = Registry("pixel_decoders")
TRANSFORMER_DECODERS = Registry("transformer_decoders")
META_ARCHS = Registry("meta_archs")


def _import_all():
    # populate registries
    import importlib

    for mod in (
        ".backbones.swin",
        ".backbones.resnet",
        ".backbones.convnext",
        ".backbones.dinat",
        ".pixel_decoders.msdeformattn",
        ".pixel_decoders.fpn",
        ".pixel_decoders.transdssl",
        ".pixel_decoders.monodepth2",
        ".pixel_decoders.dcmnet",
        ".transformer_decoder",
        ".oneformer",
    ):
        try:
            importlib.import_module(mod, __name__)
        except ModuleNotFoundError:
            pass  # component not built yet (incremental bring-up)


_import_all()
