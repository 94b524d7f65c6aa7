"""Train CLI — same surface as the reference train.py:297-321:

    python train.py --workspace W --config_yaml C --resume_checkpoint_path P
"""
import argparse
import pathlib


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workspace", type=str, required=True,
                        help="Directory of workspace.")
    parser.add_argument("--config_yaml", type=str, required=True,
                        help="Path of config file for training.")
    parser.add_argument("--resume_checkpoint_path", type=str, required=True,
                        default="",
                        help="Path of pretrained checkpoint for finetuning.")
    parser.add_argument("--max_steps", type=int, default=None,
                        help="Optional step cap (smoke runs).")
    parser.add_argument("--model_parallel", type=int, default=1,
                        help="Tensor-parallel degree over the device mesh.")
    args = parser.parse_args()

    from lass_tpu.train.loop import Trainer

    trainer = Trainer(
        config_yaml=args.config_yaml,
        workspace=args.workspace,
        resume_checkpoint_path=args.resume_checkpoint_path or None,
        model_parallel=args.model_parallel,
        filename=pathlib.Path(__file__).stem,
    )
    trainer.fit(max_steps=args.max_steps)


if __name__ == "__main__":
    main()
