"""bayesgp_tpu — TPU-native Bayesian hierarchical GP regression.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the BayesGP R
package (reference mounted at /root/reference): Gaussian-process smooths
(IWP / sGP / IID / Customized priors) in hierarchical models for
Gaussian, Poisson, Binomial, Cox partial-likelihood and case-crossover
responses, fitted with a Laplace approximation over the latent field and
adaptive Gauss-Hermite quadrature (or MAP / NUTS) over hyperparameters.
"""

from .api import model_fit
from .api_loop import model_fit_loop
from .formula import parse_formula, parse_f_call
from .terms import (build_iwp_term, build_sgp_term, build_iid_term,
                    build_customized_term, normalize_sd_prior)
from .postfit import (FitResult, compute_post_fun_iwp, compute_post_fun_sgp,
                      extract_mean_interval_given_samps)
from .basis.priors import (prior_conversion_iwp, prior_conversion_sgp,
                           compute_d_step_sgp_sd)
from .basis.osplines import (local_poly_helper, global_poly_helper,
                             compute_weights_precision)
from .basis.sgp import (compute_B_sB, compute_B_sB_helper, compute_Q_sB,
                        global_poly_sgp)
from .model.families import register_family
from .inference.mcmc import default_option_list as get_default_option_list_MCMC
from .serialize import save_fit, load_fit
from . import datasets

__version__ = "0.1.0"

__all__ = [
    "model_fit", "model_fit_loop", "parse_formula", "parse_f_call",
    "build_iwp_term", "build_sgp_term", "build_iid_term",
    "build_customized_term", "normalize_sd_prior", "FitResult",
    "compute_post_fun_iwp", "compute_post_fun_sgp",
    "extract_mean_interval_given_samps", "prior_conversion_iwp",
    "prior_conversion_sgp", "compute_d_step_sgp_sd", "local_poly_helper",
    "global_poly_helper", "compute_weights_precision", "compute_B_sB",
    "compute_B_sB_helper", "compute_Q_sB", "global_poly_sgp", "datasets",
    "register_family", "get_default_option_list_MCMC", "save_fit",
    "load_fit",
]
