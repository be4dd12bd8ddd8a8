# Submit a benchmark sweep to the TPU fleet — analog of the reference's
# cloud/examples/submit_exp.sh (AWS Batch submission).  utils/submit_exp.py
# renders one command per (env, seed) into an exp-script; the fleet's
# queue_runner consumes that script one job per slot.  Drop the rendered
# script into the fleet's queue bucket (gsutil cp) or run it locally with
# utils/queue_runner.py --workers N.

python -m mmtrl_tpu.utils.submit_exp \
    --command "python scripts/train.py --total-timesteps 10000000 --attn-type casl --track" \
    --env-ids minecraft \
    --num-seeds 3 \
    --exp-script /tmp/train_sweep.sh

python -m mmtrl_tpu.utils.queue_runner --exp-script /tmp/train_sweep.sh --workers 1

# Or ship it to the fleet queue consumed by the TPU VM startup scripts:
#   gsutil cp /tmp/train_sweep.sh gs://<project>-mmtrl-queue/v5e-1/
