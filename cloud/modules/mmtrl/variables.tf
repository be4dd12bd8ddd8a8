# Module inputs — analog of the reference's modules/cleanrl/variables.tf.

variable "fleets" {
  description = "TPU fleets to provision: name -> {accelerator_type, count}"
  type = map(object({
    accelerator_type = string # e.g. v5litepod-1, v5litepod-8
    count            = number # VMs (queue slots) of this shape
  }))
}

variable "spot" {
  description = "Provision spot (preemptible) TPUs — the reference's 50%-bid spot fleet economics (cleanrl/variables.tf:19-23); crashes are expected and handled by utils/resume.py"
  type        = bool
  default     = true
}

variable "runtime_version" {
  description = "TPU VM runtime image"
  type        = string
  default     = "v2-alpha-tpuv5-lite"
}

variable "docker_image" {
  description = "Experiment container built by utils/docker_build.py"
  type        = string
}

variable "network" {
  type    = string
  default = "default"
}
