# TPU fleet provisioning — the TPU-native analog of the reference's AWS
# Batch spot fleets (reference: cloud/main.tf, modules/cleanrl/*.tf).
#
# The reference provisions EC2 spot compute environments behind AWS Batch
# job queues; experiments are containerized and submitted with
# utils/submit_exp.py.  On Google Cloud the equivalent unit is a TPU VM
# (single host v5e for the single-chip trainers; slices for multichip) with
# spot/preemptible provisioning for the same crash-is-expected economics —
# resume handling is utils/resume.py's manifest journal either way.
#
#   terraform init && terraform apply
#
# NOTE: this repo runs in a zero-egress environment; these templates are
# shipped validated-by-review, not by `terraform apply`.

terraform {
  required_providers {
    google = {
      source  = "hashicorp/google"
      version = "~> 5.0"
    }
  }
  required_version = ">= 1.3"
}

provider "google" {
  project = var.project
  region  = var.region
  zone    = var.zone
}

variable "project" { type = string }
variable "region" {
  type    = string
  default = "us-west4"
}
variable "zone" {
  type    = string
  default = "us-west4-a"
}

module "mmtrl" {
  source = "./modules/mmtrl"

  # Spot TPUs mirror the reference's 50%-bid spot fleets: cheap, preemptible,
  # and safe because every trainer checkpoints + journals for resume.
  spot = true

  # Accelerator menu, by analogy with the reference's instance_types list
  # (cleanrl/variables.tf:19-23): one entry per (type, topology) the queue
  # may schedule onto.
  fleets = {
    "v5e-1" = { accelerator_type = "v5litepod-1", count = 8 }  # single-chip trainers
    "v5e-8" = { accelerator_type = "v5litepod-8", count = 2 }  # DP/TP jobs
  }

  runtime_version = "v2-alpha-tpuv5-lite"
  docker_image    = "ghcr.io/example/mmtrl-tpu:latest" # utils/docker_build.py
}
