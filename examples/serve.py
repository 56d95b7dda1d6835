"""HTTP serving entry point — the tpuseg equivalent of
`/root/reference/flask_app.py`: load one model at startup, serve
POST /predict and GET /getresult on 0.0.0.0:8000.

    python examples/serve.py --infer.model_dir log/MutilUNet3d/dice \
        --model.num_classes 5 --infer.new_size "[112,112,128]"

    curl -F "file=@case.nii.gz" http://localhost:8000/predict
    curl -o mask.nii.gz "http://localhost:8000/getresult?file=case_mask.nii.gz"
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpuseg.config import parse_cli


def main(argv=None):
    cfg = parse_cli(argv)
    from tpuseg.compat.seg_models import MutilUNet3dModel
    from tpuseg.infer.serving import SegServer

    x, y, z = cfg.infer.new_size
    model = MutilUNet3dModel(
        z, y, x, cfg.model.image_channel, cfg.model.num_classes,
        batch_size=1, loss_name=cfg.train.loss_name,
        inference=bool(cfg.infer.model_dir), model_path=cfg.infer.model_dir,
        features=cfg.model.features,
    )
    SegServer(model, new_size=tuple(cfg.infer.new_size)).run("0.0.0.0", 8000)


if __name__ == "__main__":
    main()
