from ct_tpu.models.rfbnet import RFBNet, Predictions, build_net  # noqa: F401
