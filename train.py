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
    parser.add_argument("--eval_indexes", type=str, default=None,
                        help="DCASE eval CSV for periodic evaluation "
                             "(every train.evaluate_step_frequency steps).")
    parser.add_argument("--eval_audio_dir", type=str, default=None)
    args = parser.parse_args()

    from lass_tpu.train.loop import Trainer, make_dcase_eval_hook

    trainer = Trainer(
        config_yaml=args.config_yaml,
        workspace=args.workspace,
        resume_checkpoint_path=args.resume_checkpoint_path or None,
        model_parallel=args.model_parallel,
        filename=pathlib.Path(__file__).stem,
    )
    eval_hook = None
    if args.eval_indexes and args.eval_audio_dir:
        eval_hook = make_dcase_eval_hook(args.eval_indexes,
                                         args.eval_audio_dir)
    trainer.fit(max_steps=args.max_steps, eval_hook=eval_hook)


if __name__ == "__main__":
    main()
