# TPU VM fleet — analog of the reference's AWS Batch compute environments +
# job queues (modules/cleanrl/main.tf).  Each fleet entry becomes `count`
# TPU VMs; the queue semantics (one job per slot, drain on completion) are
# provided by utils/queue_runner.py running in the startup script, pulling
# rendered commands from utils/submit_exp.py via a GCS bucket.

locals {
  vms = merge([
    for fleet, cfg in var.fleets : {
      for i in range(cfg.count) :
      "${fleet}-${i}" => {
        fleet            = fleet
        accelerator_type = cfg.accelerator_type
      }
    }
  ]...)
}

resource "google_tpu_v2_vm" "worker" {
  for_each = local.vms

  name             = "mmtrl-${each.key}"
  accelerator_type = each.value.accelerator_type
  runtime_version  = var.runtime_version

  network_config {
    network             = var.network
    enable_external_ips = true
  }

  scheduling_config {
    preemptible = var.spot
    spot        = var.spot
  }

  metadata = {
    # Pull the experiment container and start the queue worker; jobs are
    # rendered by utils/submit_exp.py into the queue bucket and consumed
    # one-at-a-time (utils/queue_runner.py semantics).
    startup-script = <<-EOT
      #! /bin/bash
      docker pull ${var.docker_image}
      # Sync this fleet's queue prefix and consume it one job at a time
      # (utils/queue_runner.py --exp-script semantics).
      gsutil cp gs://$(curl -s -H 'Metadata-Flavor: Google' \
        http://metadata.google.internal/computeMetadata/v1/project/project-id)-mmtrl-queue/${each.value.fleet}/queue.sh /tmp/queue.sh
      docker run --privileged --net=host \
        -e TPU_FLEET=${each.value.fleet} \
        -v /tmp/queue.sh:/tmp/queue.sh \
        ${var.docker_image} \
        python -m mmtrl_tpu.utils.queue_runner --exp-script /tmp/queue.sh --workers 1
    EOT
  }

  labels = {
    app   = "mmtrl"
    fleet = each.value.fleet
  }
}

resource "google_storage_bucket" "queue" {
  name                        = "mmtrl-queue"
  location                    = "US"
  force_destroy               = true
  uniform_bucket_level_access = true
}

output "workers" {
  value = { for k, v in google_tpu_v2_vm.worker : k => v.name }
}
